#!/usr/bin/env python
"""Interleaved in-process probe for the track/RANSAC stage.

Decomposes ransac_essential(5pt)'s ~5 ms into incremental sub-programs
(each program carries the same ~0.7-1.0 ms host dispatch; the DIFFS
between adjacent variants are the in-program stage costs).  Same
protocol as probe_desc.py: all variants round-robin in one process,
min over rounds.

    python benchmarks/probe_track.py [--rounds 5] [--iters 25]
"""

from __future__ import annotations

import argparse
import functools
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
from cuda_surf_tpu.ops.matcher import match_keypoints
from cuda_surf_tpu.slam.tracking import default_intrinsics
from cuda_surf_tpu.geometry.epipolar import (
    ransac_essential, normalize_with_intrinsics, _sampson_inlier_counts,
    _eight_point, project_essential, sampson_error, recover_pose)
from cuda_surf_tpu.geometry import fivepoint as fp
from cuda_surf_tpu.types import compact

DATA = "/root/reference/data"
H = 128


def build_inputs():
    cfg = SurfConfig(noctaves=4, thresh=4.0, upright=True, max_pts=4096,
                     candidates_per_octave=4096)
    det = jax.jit(lambda im: detect_and_compute(im, cfg))
    imgs = [jnp.asarray(read_pgm(f"{DATA}/{n}.pgm")) for n in ("left", "right")]
    (kp1, d1), (kp2, d2) = det(imgs[0]), det(imgs[1])
    intr = default_intrinsics(*imgs[0].shape)
    m = match_keypoints(kp1, d1, kp2, d2)
    good = (m.valid & (m.ambiguity < 0.95)
            & (kp1.laplace == kp2.laplace[m.index]))
    x1 = normalize_with_intrinsics(jnp.stack([kp1.x, kp1.y], -1),
                                   intr.fx, intr.fy, intr.cx, intr.cy)
    x2 = normalize_with_intrinsics(jnp.stack([m.match_x, m.match_y], -1),
                                   intr.fx, intr.fy, intr.cx, intr.cy)
    return (jax.device_put(x1), jax.device_put(x2), jax.device_put(good),
            jax.random.PRNGKey(7))


def sample_pts(x1, x2, good, key):
    k = x1.shape[0]
    count = jnp.maximum(good.sum(), 1)
    _, _, order = compact(good, k, jnp.arange(k, dtype=jnp.int32))
    raw = jax.random.randint(key, (H, 5), 0, jnp.iinfo(jnp.int32).max)
    sample = order[raw % count]
    return x1[sample], x2[sample]


def fp_prefix(stage, x1, x2, good, key):
    """five_point re-expressed as an incremental prefix of stages."""
    p1, p2 = sample_pts(x1, x2, good, key)
    u1, v1 = p1[..., 0], p1[..., 1]
    u2, v2 = p2[..., 0], p2[..., 1]
    one = jnp.ones_like(u1)
    Q = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2,
                   u1, v1, one], axis=-1)
    if stage == "sample":
        return Q
    null = fp._nullspace4(Q)
    ortho = []
    for kk in range(4):
        v = null[..., kk]
        for u in ortho:
            v = v - jnp.sum(v * u, -1, keepdims=True) * u
        n = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
        ortho.append(v / jnp.maximum(n, 1e-20))
    null = jnp.stack(ortho, axis=-1)
    basis = jnp.swapaxes(null, -1, -2).reshape(*null.shape[:-2], 4, 3, 3)
    if stage == "null":
        return basis
    M = fp._constraint_matrix(basis)
    rn = jnp.max(jnp.abs(M), axis=-1, keepdims=True)
    M = M / jnp.maximum(rn, 1e-30)
    if stage == "cm":
        return M
    a, b, c = fp._bz_rows(M)
    det = fp._det_bz(a, b, c)
    if stage == "det":
        return det
    z, valid = fp._roots_dk(det)
    if stage == "roots":
        return z, valid
    raise ValueError(stage)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=25)
    args = ap.parse_args()

    x1, x2, good, key = build_inputs()

    def ransac(solver="5pt", n_hyp=H):
        def f(x1, x2, good, key):
            return ransac_essential(x1, x2, good, key, n_hypotheses=n_hyp,
                                    inlier_thresh=2e-5, solver=solver)
        return jax.jit(f)

    def fivepoint_full(x1, x2, good, key):
        p1, p2 = sample_pts(x1, x2, good, key)
        return fp.five_point(p1, p2)

    def score_only(x1, x2, good, key):
        Es, ok = fivepoint_full(x1, x2, good, key)
        return _sampson_inlier_counts(Es.reshape(-1, 3, 3), x1, x2, good,
                                      2e-5)

    def tail_full(x1, x2, good, key):
        """= full ransac (fivepoint + score + refits + pose)."""
        return ransac_essential(x1, x2, good, key, n_hypotheses=H,
                                inlier_thresh=2e-5, solver="5pt")

    def samp_compact(x1, x2, good, key):
        k = x1.shape[0]
        _, _, order = compact(good, k, jnp.arange(k, dtype=jnp.int32))
        return order

    def samp_ss(x1, x2, good, key):
        """searchsorted-based valid-row sampling (no compact)."""
        k = x1.shape[0]
        count = jnp.maximum(good.sum(), 1)
        cdf = jnp.cumsum(good.astype(jnp.int32))
        raw = jax.random.randint(key, (H, 5), 0, jnp.iinfo(jnp.int32).max)
        tgt = (raw % count) + 1
        sample = jnp.searchsorted(cdf, tgt.reshape(-1)).reshape(H, 5)
        return x1[sample], x2[sample]

    def fp_gn(n):
        def f(x1, x2, good, key):
            p1, p2 = sample_pts(x1, x2, good, key)
            return fp.five_point(p1, p2, gn_iters=n)
        return jax.jit(f)

    E0 = jnp.eye(3) + 1e-3
    def t_proj(x1, x2, good, key):
        return (project_essential(E0 + x1[0, 0]),
                project_essential(E0 + x2[0, 0]),
                project_essential(E0 + x1[1, 0]))

    def t_refit(x1, x2, good, key):
        E = project_essential(_eight_point(x1, x2, good.astype(x1.dtype)))
        err = sampson_error(E, x1, x2)
        return (err < 2e-5) & good

    def t_pose(x1, x2, good, key):
        return recover_pose(E0, x1, x2, good)

    fns = {
        "full": ransac(),
        "fp_only": jax.jit(fivepoint_full),
        "fp_gn4": fp_gn(4),
        "fp_gn2": fp_gn(2),
        "fp_gn0": fp_gn(0),
        "score": jax.jit(score_only),
        "s_sample": jax.jit(functools.partial(fp_prefix, "sample")),
        "s_compact": jax.jit(samp_compact),
        "s_ss": jax.jit(samp_ss),
        "s_null": jax.jit(functools.partial(fp_prefix, "null")),
        "s_cm": jax.jit(functools.partial(fp_prefix, "cm")),
        "s_det": jax.jit(functools.partial(fp_prefix, "det")),
        "s_roots": jax.jit(functools.partial(fp_prefix, "roots")),
        "t_proj3": jax.jit(t_proj),
        "t_refit": jax.jit(t_refit),
        "t_pose": jax.jit(t_pose),
    }
    a = (x1, x2, good, key)
    best = {v: float("inf") for v in fns}
    for v, f in fns.items():
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        print(f"compiled {v} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    for _ in range(args.rounds):
        for v, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(*a)
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            best[v] = min(best[v], dt)
    res = ransac()(*a)
    # GN-iteration parity: does the best consensus count survive fewer
    # polish iterations?  (The 2 guided refits re-derive E from the
    # consensus set, so consensus count is the load-bearing output.)
    cons = {}
    for n in (8, 4, 2, 0):
        Es, ok = fp_gn(n)(*a)
        cnt = _sampson_inlier_counts(Es.reshape(-1, 3, 3), x1, x2, good,
                                     2e-5)
        cons[n] = int(jnp.max(jnp.where(ok.reshape(-1), cnt, -1)))
    print(json.dumps({"ms": {v: round(t, 3) for v, t in best.items()},
                      "n_inliers": int(res.n_inliers),
                      "gn_best_consensus": cons}))


if __name__ == "__main__":
    main()
