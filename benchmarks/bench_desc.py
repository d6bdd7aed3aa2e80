#!/usr/bin/env python
"""Descriptor-stage microbenchmark: isolates the shared-tile (supertile)
path and the span-bucketed fallback of ops/patch_wavelets.py on the real
keypoint distribution of a reference frame.

The describe stage is the pair bench's dominant term; headline moves of
< 0.5 ms are inside tunnel noise, so descriptor work must be judged by
these standalone sub-path timers (PERF.md protocol).

    python benchmarks/bench_desc.py [--iters 100] [--image .../left.pgm]

Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cuda_surf_tpu import SurfConfig
from cuda_surf_tpu.io import read_pgm
from cuda_surf_tpu.frontend import detect_and_compute
from cuda_surf_tpu.ops.integral import integral_image
from cuda_surf_tpu.ops import patch_wavelets as pw

DATA = "/root/reference/data"


def desc_params(cfg, ii, kps):
    """Replicates ops/descriptor.describe's per-keypoint parameter
    derivation (descriptor.py:47-72, upright path)."""
    x, y, scale, valid = kps.x, kps.y, kps.scale, kps.valid
    work = jnp.float32(1.65) * scale
    step = jnp.maximum(jnp.round(work * 0.5).astype(jnp.int32), 1)
    ix = jnp.round(x).astype(jnp.int32)
    iy = jnp.round(y).astype(jnp.int32)
    fracx = x - ix.astype(jnp.float32)
    fracy = y - iy.astype(jnp.float32)
    spacing = work * jnp.float32(cfg.mag_factor)
    iscale = jnp.trunc(work).astype(jnp.int32)
    irad = jnp.round(spacing * jnp.float32((cfg.desc_wsz + 1) * 0.5)
                     / step.astype(jnp.float32)).astype(jnp.int32)
    fparams = jnp.stack([fracy, fracx, spacing, jnp.zeros_like(x),
                         jnp.ones_like(x), jnp.zeros_like(x),
                         jnp.zeros_like(x), jnp.zeros_like(x)], axis=0)
    return ix, iy, step, iscale, irad, valid, fparams


def time_fn(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--image", default=f"{DATA}/left.pgm")
    args = ap.parse_args()

    cfg = SurfConfig(noctaves=4, thresh=4.0, upright=True, max_pts=4096,
                     candidates_per_octave=4096)
    img = jnp.asarray(read_pgm(args.image))
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
    span_cap, s_cap = pw._LEVELS[0][4], pw._LEVELS[0][5]
    elig = vnp & (span <= span_cap) & (np.asarray(iscale) <= s_cap)
    n_tile = int(elig.sum())
    n_fall = int((vnp & ~elig).sum())
    dev = jax.devices()[0].device_kind

    elig_j = jnp.asarray(elig)
    rem_j = valid & ~elig_j

    def f_full(ii, ix, iy, step, iscale, irad, valid, fparams):
        return pw.descriptor_rows(ii, ix, iy, step, iscale, irad, valid,
                                  fparams, R=R, max_span=cfg.max_desc_span,
                                  cfg_s=cfg_s)

    def f_tile(ii, ix, iy, step, iscale, irad, e, fparams):
        return pw._run_supertile(ii, ix, iy, step, iscale, irad, e,
                                 fparams, R=R, cfg_s=cfg_s)

    def f_fall(ii, ix, iy, step, iscale, irad, r, fparams):
        return pw._run_bucketed(ii, ix, iy, step, iscale, irad, r,
                                fparams, R=R, max_span=cfg.max_desc_span,
                                mode="desc", cfg_s=cfg_s)

    base = (ii, ix, iy, step, iscale, irad)
    rows = [
        ("desc_full", jax.jit(f_full), base + (valid, fparams)),
        ("desc_supertile", jax.jit(f_tile), base + (elig_j, fparams)),
        ("desc_bucketed", jax.jit(f_fall), base + (rem_j, fparams)),
    ]
    for name, fn, a in rows:
        ms = time_fn(fn, a, args.iters)
        n = {"desc_full": n_tile + n_fall, "desc_supertile": n_tile,
             "desc_bucketed": n_fall}[name]
        print(json.dumps({"metric": "desc_ms", "variant": name,
                          "value": round(ms, 3), "n_kp": n,
                          "us_per_kp": round(ms * 1e3 / max(n, 1), 3),
                          "device": dev}))


if __name__ == "__main__":
    main()
