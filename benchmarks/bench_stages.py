#!/usr/bin/env python
"""Per-stage microbenchmarks (the perf-regression harness of SURVEY.md
section 4, mirroring the reference demo's timed loops).

Reports one JSON line per stage.  Stage timings use incremental program
variants — each program includes everything up to its stage, so the
difference between consecutive rows isolates one stage without paying
the per-dispatch overhead of a tunneled TPU per stage.

    python benchmarks/bench_stages.py [--iters 40]
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

from cuda_surf_tpu import SurfConfig
from cuda_surf_tpu.io import read_pgm
from cuda_surf_tpu.frontend import detect_and_compute
from cuda_surf_tpu.ops.integral import integral_image
from cuda_surf_tpu.ops.hessian import response_pyramid
from cuda_surf_tpu.ops.extrema import detect
from cuda_surf_tpu.ops.fused_detect import fused_pyramid, use_fused
from cuda_surf_tpu.ops.matcher import match_keypoints

DATA = "/root/reference/data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--image", default=f"{DATA}/left.pgm")
    ap.add_argument("--batch", type=int, default=0, metavar="B",
                    help="profile detect_and_compute_batch's stages at "
                         "batch size B instead of the single-frame path")
    ap.add_argument("--rotated", action="store_true",
                    help="profile the rotation-invariant path: isolates "
                         "orientation assignment and rotated describe")
    args = ap.parse_args()

    cfg = SurfConfig(noctaves=4, thresh=4.0, upright=True, max_pts=4096,
                     candidates_per_octave=4096)
    img = jnp.asarray(read_pgm(args.image))
    h, w = img.shape
    sched = cfg.hessian_schedule(h, w)

    fused = use_fused(cfg)
    if args.batch:
        return batch_stages(cfg, img, args)
    if args.rotated:
        return rotated_stages(cfg, img, args)

    def s_integral(im):
        return integral_image(im)

    # pyramid/detect rows follow the REAL frontend path: the fused
    # Pallas kernel on TPU (pyramid+NMS in one pass), XLA elsewhere.
    def s_pyramid(im):
        ii = integral_image(im)
        if fused:
            pyr, masks = fused_pyramid(im, cfg, h, w)
            return ii, pyr, masks
        return ii, response_pyramid(ii, cfg, h, w, img=im)

    def s_detect(im):
        ii = integral_image(im)
        if fused:
            pyr, masks = fused_pyramid(im, cfg, h, w)
            return ii, detect(pyr, sched, cfg, cand_masks=masks)
        pyr = response_pyramid(ii, cfg, h, w, img=im)
        return ii, detect(pyr, sched, cfg)

    def s_keypoints(im):
        return detect_and_compute(im, cfg, compute_descriptors=False)

    def s_full(im):
        return detect_and_compute(im, cfg)

    stages = [("integral", s_integral), ("pyramid", s_pyramid),
              ("detect", s_detect), ("keypoints", s_keypoints),
              ("detect_describe", s_full)]
    prev = 0.0
    rows = []
    for name, fn in stages:
        f = jax.jit(fn)
        r = f(img)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(args.iters):
            r = f(img)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        ms = (time.time() - t0) / args.iters * 1e3
        rows.append({"stage": name, "cumulative_ms": round(ms, 3),
                     "stage_ms": round(ms - prev, 3)})
        prev = ms

    kps, desc = jax.jit(s_full)(img)
    fm = jax.jit(lambda: match_keypoints(kps, desc, kps, desc))
    m = fm()
    _ = float(jnp.sum(m.score))
    t0 = time.time()
    for _ in range(args.iters):
        m = fm()
    _ = float(jnp.sum(m.score))
    rows.append({"stage": "match", "cumulative_ms": None,
                 "stage_ms": round((time.time() - t0) / args.iters * 1e3, 3)})

    for row in rows:
        print(json.dumps({"metric": "stage_ms", **row,
                          "device": str(jax.devices()[0])}))


def rotated_stages(cfg, img, args):
    """Incremental variants isolating the rotated path's extra stages:
    orientation assignment (a second bucketed patch pass + windowed
    histogram) and the rotated in-kernel binning."""
    import dataclasses
    from cuda_surf_tpu.ops.orientation import assign_orientations
    from cuda_surf_tpu.ops.integral import integral_image as s_ii

    rcfg = dataclasses.replace(cfg, upright=False)

    def kp_only(im):
        return detect_and_compute(im, rcfg, compute_descriptors=False)

    def kp_orient(im):
        kps, _ = detect_and_compute(im, rcfg, compute_descriptors=False)
        ii = s_ii(im)
        return assign_orientations(ii, rcfg, kps.x, kps.y, kps.scale,
                                   kps.valid)

    def full_rot(im):
        return detect_and_compute(im, rcfg)

    def full_upright(im):
        return detect_and_compute(im, cfg)

    stages = [("r_keypoints", kp_only), ("r_orientation", kp_orient),
              ("r_full", full_rot), ("upright_full", full_upright)]
    prev = 0.0
    for name, fn in stages:
        f = jax.jit(fn)
        r = f(img)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(args.iters):
            r = f(img)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        ms = (time.time() - t0) / args.iters * 1e3
        print(json.dumps({"metric": "rot_stage_ms", "stage": name,
                          "cumulative_ms": round(ms, 3),
                          "stage_ms": round(ms - prev, 3),
                          "device": str(jax.devices()[0])}), flush=True)
        prev = ms


def batch_stages(cfg, img, args):
    """Incremental-variant stage timings for the batched pipeline
    (detect_and_compute_batch) at batch size B, per frame."""
    import numpy as np
    from cuda_surf_tpu.frontend import (_detect_frame, _make_keypoints,
                                        detect_and_compute_batch)
    from cuda_surf_tpu.ops.extrema import detect as _detect

    B = args.batch
    imgs = jnp.stack([img] * B)
    sched = cfg.hessian_schedule(*img.shape)

    def upto_pyr(ims):
        iis, pyrs, masks = [], [], []
        for f in range(B):
            ii_f, pyr_f, m_f, _ = _detect_frame(ims[f], cfg)
            iis.append(ii_f); pyrs.append(pyr_f); masks.append(m_f)
        ii = jnp.stack(iis)
        pyr_b = [jnp.stack([pyrs[f][o] for f in range(B)])
                 for o in range(cfg.noctaves)]
        mask_b = ([jnp.stack([masks[f][o] for f in range(B)])
                   for o in range(cfg.noctaves)]
                  if masks[0] is not None else None)
        return ii, pyr_b, mask_b

    def upto_detect(ims):
        ii, pyr_b, mask_b = upto_pyr(ims)
        if mask_b is not None:
            cand = jax.vmap(
                lambda p, m: _detect(p, sched, cfg, cand_masks=m))(
                    pyr_b, mask_b)
        else:
            cand = jax.vmap(lambda p: _detect(p, sched, cfg))(pyr_b)
        return ii, cand

    def upto_kp(ims):
        ii, cand = upto_detect(ims)
        return jax.vmap(lambda i2, c: _make_keypoints(i2, c, cfg))(ii, cand)

    def full(ims):
        return detect_and_compute_batch(ims, cfg)

    stages = [("b_pyramid", upto_pyr), ("b_detect", upto_detect),
              ("b_keypoints", upto_kp), ("b_full", full)]
    prev = 0.0
    for name, fn in stages:
        f = jax.jit(fn)
        r = f(imgs)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        t0 = time.time()
        for _ in range(args.iters):
            r = f(imgs)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
        ms = (time.time() - t0) / args.iters * 1e3 / B
        print(json.dumps({"metric": "stage_ms_per_frame", "stage": name,
                          "B": B, "cumulative_ms": round(ms, 3),
                          "stage_ms": round(ms - prev, 3),
                          "device": str(jax.devices()[0])}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
