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
# probe the (default-disabled) step-decimated kernels at these steps
DEC_PROBE_STEPS = (4, 5, 6, 7, 8)


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
    """Min of 3 interleaved round averages: the tunnel injects multi-ms
    spikes into whole loops, so a single average is untrustworthy
    (PERF.md protocol notes)."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    n = max(iters // 3, 5)
    for _ in range(3):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


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
    dev = jax.devices()[0].device_kind

    # per-level eligibility exactly as descriptor_rows routes; on the
    # resident-planes path one merged level takes the union
    res_elig = (vnp & (span <= pw._RES_TILE[4])
                & (np.asarray(iscale) <= pw._RES_TILE[5]))
    remaining = vnp.copy()
    eligs = []
    for (_, _, _, _, span_cap, s_cap) in pw._LEVELS:
        e = remaining & (span <= span_cap) & (np.asarray(iscale) <= s_cap)
        eligs.append(e)
        remaining = remaining & ~e

    def f_full(ii, ix, iy, step, iscale, irad, valid, fparams):
        return pw.descriptor_rows(ii, ix, iy, step, iscale, irad, valid,
                                  fparams, R=R, max_span=cfg.max_desc_span,
                                  cfg_s=cfg_s)

    def make_tile(lv):
        def f_tile(ii, ix, iy, step, iscale, irad, e, fparams):
            return pw._run_supertile(ii, ix, iy, step, iscale, irad, e,
                                     fparams, R=R, cfg_s=cfg_s, level=lv)
        return f_tile

    def f_fall(ii, ix, iy, step, iscale, irad, r, fparams):
        return pw._run_bucketed(ii, ix, iy, step, iscale, irad, r,
                                fparams, R=R, max_span=cfg.max_desc_span,
                                mode="desc", cfg_s=cfg_s,
                                span_lo=pw._LEVELS[-1][4],
                                min_span=pw._LEVELS[-1][4],
                                rad_bound_fn=cfg.desc_iradius_bound)

    def f_dec(ii, ix, iy, step, iscale, irad, r, fparams):
        # the step-decimated kernels exactly as descriptor_rows routes
        rows = None
        rem = r
        for SD in DEC_PROBE_STEPS:
            rb, sm = cfg.desc_step_bounds(SD)
            out, taken = pw._run_step_dec(
                ii, ix, iy, step, iscale, irad, rem & (step == SD),
                fparams, SD=SD, R_b=rb, s_max=sm, cfg_s=cfg_s)
            rows = out if rows is None else rows + out
            rem = rem & ~taken
        return rows, rem

    def f_res(ii, ix, iy, step, iscale, irad, e, fparams):
        return pw._run_supertile_res(ii, ix, iy, step, iscale, irad, e,
                                     fparams, R=R, cfg_s=cfg_s)

    base = (ii, ix, iy, step, iscale, irad)
    rows = [("desc_full", jax.jit(f_full), base + (valid, fparams)),
            ("desc_supertile_res", jax.jit(f_res),
             base + (jnp.asarray(res_elig), fparams))]
    for lv, e in enumerate(eligs):
        rows.append((f"desc_supertile_l{lv}", jax.jit(make_tile(lv)),
                     base + (jnp.asarray(e), fparams)))
    rows.append(("desc_dec", jax.jit(f_dec),
                 base + (jnp.asarray(remaining), fparams)))
    # the step >= 9 tail that stays bucketed after decimation routing
    step_np = np.asarray(step)
    tail = remaining.copy()
    for SD in DEC_PROBE_STEPS:
        tail = tail & ~(step_np == SD)
    rows.append(("desc_bucketed_tail", jax.jit(f_fall),
                 base + (jnp.asarray(tail), fparams)))
    rows.append(("desc_bucketed_all", jax.jit(f_fall),
                 base + (jnp.asarray(remaining), fparams)))
    counts = {f"desc_supertile_l{lv}": int(e.sum())
              for lv, e in enumerate(eligs)}
    counts["desc_dec"] = int(sum((np.asarray(step) == SD) & remaining
                              for SD in DEC_PROBE_STEPS).sum())
    counts["desc_bucketed_all"] = int(remaining.sum())
    counts["desc_full"] = int(vnp.sum())
    counts["desc_supertile_res"] = int(res_elig.sum())
    counts["desc_bucketed_tail"] = int(tail.sum())
    for name, fn, a in rows:
        ms = time_fn(fn, a, args.iters)
        n = counts[name]
        print(json.dumps({"metric": "desc_ms", "variant": name,
                          "value": round(ms, 3), "n_kp": n,
                          "us_per_kp": round(ms * 1e3 / max(n, 1), 3),
                          "device": dev}))


if __name__ == "__main__":
    main()
