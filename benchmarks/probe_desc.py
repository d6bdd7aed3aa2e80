#!/usr/bin/env python
"""Interleaved in-process A/B probe for the resident supertile kernel.

Process-to-process variance on the tunneled TPU is +-0.5 ms, so kernel
A/Bs are only meaningful when every variant is timed round-robin inside
ONE process (min over rounds per variant).  Ablation variants are
timing-only (wrong results).

    python benchmarks/probe_desc.py [--rounds 5] [--iters 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from cuda_surf_tpu import SurfConfig
from cuda_surf_tpu.io import read_pgm
from cuda_surf_tpu.frontend import detect_and_compute
from cuda_surf_tpu.ops.integral import integral_image
from cuda_surf_tpu.ops import patch_wavelets as pw
from bench_desc import desc_params

DATA = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--variants", default="full,nostageb,nobin,nocolw,norw,stagea1,zeroelig")
    args = ap.parse_args()

    cfg = SurfConfig(noctaves=4, thresh=4.0, upright=True, max_pts=4096,
                     candidates_per_octave=4096)
    img = jnp.asarray(read_pgm(f"{DATA}/left.pgm"))
    ih, iw = img.shape
    kps, _ = jax.jit(lambda im: detect_and_compute(im, cfg))(img)
    ii = jax.jit(integral_image)(img)
    ix, iy, step, iscale, irad, valid, fparams = jax.jit(
        lambda ii, k: desc_params(cfg, ii, k))(ii, kps)
    R = cfg.max_iradius
    cfg_s = (cfg.desc_wsz, cfg.orient_size, cfg.upright, cfg.extended,
             ih, iw)
    span = np.asarray(irad * step + iscale + 1)
    vnp = np.asarray(valid)
    res_elig = jnp.asarray(
        vnp & (span <= pw._RES_TILE[4])
        & (np.asarray(iscale) <= pw._RES_TILE[5]))
    n = int(np.asarray(res_elig).sum())

    def make(ab):
        def f(ii, ix, iy, step, iscale, irad, e, fparams):
            return pw._run_supertile_res(
                ii, ix, iy, step, iscale, irad, e, fparams, R=R,
                cfg_s=cfg_s, ablate=None if ab == "full" else ab)
        return jax.jit(f)

    a = (ii, ix, iy, step, iscale, irad, res_elig, fparams)
    az = (ii, ix, iy, step, iscale, irad, jnp.zeros_like(res_elig), fparams)
    fns = {v: make("full" if v == "zeroelig" else v)
           for v in args.variants.split(",")}
    argmap = {v: (az if v == "zeroelig" else a) for v in fns}
    best = {v: float("inf") for v in fns}
    for v, f in fns.items():          # compile all first
        jax.block_until_ready(f(*argmap[v]))
    for _ in range(args.rounds):
        for v, f in fns.items():
            av = argmap[v]
            out = f(*av)
            _ = float(jnp.sum(out))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(*av)
            _ = float(jnp.sum(out))
            best[v] = min(best[v],
                          (time.perf_counter() - t0) / args.iters * 1e3)
    for v, ms in best.items():
        print(json.dumps({"variant": v, "ms": round(ms, 3), "n_kp": n,
                          "us_per_kp": round(ms * 1e3 / n, 3)}))


if __name__ == "__main__":
    main()
