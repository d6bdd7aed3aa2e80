"""Monocular visual-odometry / SLAM pipeline.

Orchestrates the jitted stages (frontend, tracking, BA) over an image
sequence: per-frame SURF features, frame-to-frame RANSAC pose, median-
depth-ratio scale propagation (monocular scale), keyframe selection and
pose accumulation.  Host-side logic is orchestration only — all numerics
run in jitted JAX.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SurfConfig
from ..frontend import Surf
from .tracking import Intrinsics, default_intrinsics, track_pair
from ..geometry.epipolar import normalize_with_intrinsics
from ..ba import BAProblem, BAState, run_lm
from ..utils.metrics import MetricsLogger


def _refine_pair(res, kp1, intr, n_iters: int = 5):
    """Two-view bundle adjustment polish of a tracked pair: refine the
    RANSAC relative pose + triangulated points with masked LM over the
    inlier reprojections (camera 0 gauge-fixed at identity).  Returns
    (R, t) with t renormalized to unit length (monocular gauge)."""
    m = res.matches
    x1 = normalize_with_intrinsics(jnp.stack([kp1.x, kp1.y], -1),
                                   intr.fx, intr.fy, intr.cx, intr.cy)
    x2 = normalize_with_intrinsics(jnp.stack([m.match_x, m.match_y], -1),
                                   intr.fx, intr.fy, intr.cx, intr.cy)
    P = x1.shape[0]
    cam_idx = jnp.tile(jnp.arange(2, dtype=jnp.int32), (P, 1))
    uv = jnp.stack([x1, x2], axis=1)                      # (P, 2, 2)
    mask = jnp.stack([res.inliers, res.inliers], axis=1)
    prob = BAProblem(cam_idx=cam_idx, uv=uv, mask=mask)
    state = BAState(
        R=jnp.stack([jnp.eye(3, dtype=jnp.float32), res.R]),
        t=jnp.stack([jnp.zeros(3, jnp.float32), res.t]),
        points=jnp.where(res.inliers[:, None], res.points3d,
                         jnp.float32(1.0)))
    out, _ = run_lm(state, prob, n_iters=n_iters)
    R = out.R[1]
    t = out.t[1]
    return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-9)


@dataclasses.dataclass
class FrameState:
    index: int
    R: np.ndarray          # world->cam
    t: np.ndarray
    n_inliers: int
    is_keyframe: bool


class SlamPipeline:
    def __init__(self, cfg: SurfConfig | None = None,
                 intrinsics: Intrinsics | None = None,
                 ratio: float = 0.95, min_inliers: int = 30,
                 keyframe_min_inlier_frac: float = 0.5,
                 ba_refine: bool = False, ba_iters: int = 5,
                 window_ba: int = 0, loop_detect: bool = False,
                 loop_min_gap: int = 5, loop_store: int | None = None,
                 seed: int = 0,
                 metrics: MetricsLogger | None = None):
        self.cfg = cfg if cfg is not None else SurfConfig(
            max_pts=2048, candidates_per_octave=2048)
        self.surf = Surf(self.cfg)
        self.intr = intrinsics
        self.ratio = ratio
        self.min_inliers = min_inliers
        self.kf_frac = keyframe_min_inlier_frac
        self.ba_refine = ba_refine
        self.window_ba = window_ba
        self.map = None
        self.loop_detect = loop_detect
        self.loop_min_gap = loop_min_gap
        # bound on frames retaining full loop-verification features
        # (host memory + checkpoint size; see LoopDetector.max_store)
        self.loop_store = loop_store
        self.loops = []
        self.frame_depths = []
        self._detector = None
        self.key = jax.random.PRNGKey(seed)
        self.metrics = metrics or MetricsLogger()
        self._track = jax.jit(
            lambda kp1, d1, kp2, d2, intr, key: track_pair(
                kp1, d1, kp2, d2, intr, key, ratio=self.ratio))
        self._refine = jax.jit(
            lambda res, kp1, intr: _refine_pair(res, kp1, intr,
                                                n_iters=ba_iters))
        self.frames: List[FrameState] = []
        self._prev = None          # (kps, desc)
        self._prev_depth = None    # median depth of last pair's landmarks
        self._prev_kp_depth = None  # (slots,) global-unit depths on the
        #                             previous frame's keypoint slots

    def reset(self):
        self.frames.clear()
        self._prev = None
        self._prev_depth = None
        self._prev_kp_depth = None
        self.loops = []
        self.frame_depths = []
        self.map = None
        self._detector = None

    def process(self, image: np.ndarray) -> FrameState:
        h, w = image.shape
        if self.intr is None:
            self.intr = default_intrinsics(h, w)
        kps, desc = self.surf.detect_and_compute(image)
        if self._prev is None:
            st = FrameState(0, np.eye(3), np.zeros(3), 0, True)
            self.frames.append(st)
            self._prev = (kps, desc)
            if self.window_ba:
                from .mapping import KeyframeMap
                self.map = KeyframeMap(self.intr, window=self.window_ba)
                self.map.add_keyframe(jax.device_get(kps), st.R, st.t)
            if self.loop_detect:
                from .loopclosure import LoopDetector
                self._detector = LoopDetector(self.intr,
                                              min_gap=self.loop_min_gap,
                                              max_store=self.loop_store)
                self._detector.add(kps, desc)
            self.frame_depths.append(1.0)
            self.metrics.log(frame=0, keypoints=int(kps.count), inliers=0)
            return st

        kp1, d1 = self._prev
        self.key, sub = jax.random.split(self.key)
        res = self._track(kp1, d1, kps, desc, self.intr, sub)
        n_inl = int(res.n_inliers)
        if self.ba_refine and n_inl >= self.min_inliers:
            R_ref, t_ref = self._refine(res, kp1, self.intr)
            R_rel = np.asarray(R_ref, np.float64)
            t_rel = np.asarray(t_ref, np.float64)
        else:
            R_rel = np.asarray(res.R, np.float64)
            t_rel = np.asarray(res.t, np.float64)

        # Monocular scale propagation.  Preferred: per-point depth ratio
        # over the PHYSICAL points shared by consecutive pairs — pair
        # (k-2, k-1) left global-unit depths on frame k-1's keypoint
        # slots; pair (k-1, k) re-triangulates the same slots in its own
        # local unit, and the median slot-wise ratio is exactly the
        # local-to-global scale.  Fallback (too few shared points):
        # whole-pair median-depth ratio, which is biased when the view
        # direction (and hence the visible depth distribution) changes.
        # Cheirality-consistent inliers only: Sampson inliers can
        # triangulate behind a camera, and one negative median would
        # flip the propagated scale sign for the rest of the sequence.
        inl = np.asarray(res.inliers)
        X3 = np.asarray(res.points3d)
        z1 = X3[:, 2]                       # depth in cam_{k-1}, pair units
        z2 = X3 @ np.asarray(res.R, np.float64)[2] + float(res.t[2])
        pos = inl & (z1 > 1e-9) & (z2 > 1e-9)
        med_loc = float(np.median(z1[pos])) if pos.any() else 1.0
        scale = 1.0
        d_prev = self._prev_kp_depth
        shared = (pos & np.isfinite(d_prev)) if d_prev is not None else None
        if shared is not None and shared.sum() >= 6:
            scale = float(np.median(d_prev[shared] / z1[shared]))
        elif self._prev_depth is not None and med_loc > 1e-6:
            scale = self._prev_depth / med_loc
        # frame_depths semantics: fd[k] = median scene depth seen FROM
        # camera k, in chain-gauge units — the quantity the Sim(3)
        # loop-edge scale recovery divides by (sim3graph.py).  z2 is
        # the cam_k depth of the pair's points; the first pair also
        # backfills fd[0] (constructed as a placeholder 1.0, which
        # used to corrupt every loop edge anchored at frame 0 by the
        # full depth/baseline ratio, ~20x here).
        med_depth = (float(np.median(z2[pos])) if pos.any() else 1.0) * scale

        prev = self.frames[-1]
        if n_inl < self.min_inliers:
            # tracking failure: keep previous pose (constant model); the
            # failed pair's triangulation is garbage, so drop the
            # per-slot depths AND leave _prev_depth/frame_depths at the
            # last good pair's value rather than poison the monocular
            # scale chain (and any loop edge anchored at this frame)
            # with a random med(z2)/med(z1) ratio
            self._prev_kp_depth = None
            R_w, t_w = prev.R, prev.t
        else:
            if len(self.frames) == 1 and pos.any():
                self.frame_depths[0] = med_loc * scale
            self._prev_depth = med_depth
            # leave global-unit depths on the CURRENT frame's matched
            # slots for the next pair
            idx = np.asarray(res.matches.index)
            d_cur = np.full(int(kps.x.shape[0]), np.nan)
            ok = pos & (idx >= 0) & (idx < d_cur.shape[0])
            d_cur[idx[ok]] = scale * z2[ok]
            self._prev_kp_depth = d_cur
            R_w = R_rel @ prev.R
            t_w = R_rel @ prev.t + scale * t_rel
        is_kf = n_inl < self.kf_frac * max(int(kp1.count), 1)
        st = FrameState(len(self.frames), R_w, t_w, n_inl, is_kf)
        self.frames.append(st)
        if self.map is not None:
            self.map.add_keyframe(
                jax.device_get(kps), st.R, st.t,
                match_index=np.asarray(res.matches.index),
                match_ok=np.asarray(res.inliers))
            cost = self.map.refine_window()
            if cost is not None:
                # write refined window poses back into the trajectory
                for kf in self.map.keyframes[-self.map.window:]:
                    self.frames[kf.index] = dataclasses.replace(
                        self.frames[kf.index], R=kf.R, t=kf.t)
                st = self.frames[-1]
        self.frame_depths.append(self._prev_depth or 1.0)
        if self._detector is not None:
            self._detector.add(kps, desc)
            found = self._detector.query()
            self.loops.extend(found)
        self._prev = (kps, desc)
        self.metrics.log(frame=st.index, keypoints=int(kps.count),
                         inliers=n_inl, keyframe=is_kf,
                         loops=len(self.loops))
        return st

    def trajectory(self) -> np.ndarray:
        """Camera centres (N, 3): c = -R^T t."""
        return np.stack([-f.R.T @ f.t for f in self.frames])

    def optimize_posegraph(self, n_iters: int = 10) -> float:
        """Global pose-graph smoothing over the whole trajectory: one
        SE(3) node per frame, chain edges from the recorded consecutive
        relative poses plus any detected loop-closure edges.  Returns
        the final summed edge residual."""
        from .loopclosure import optimize_with_loops
        if len(self.frames) < 3:
            return 0.0
        Ro, to, cost = optimize_with_loops(self.frames, self.loops,
                                           n_iters=n_iters,
                                           frame_depths=self.frame_depths)
        for i, f in enumerate(self.frames):
            self.frames[i] = dataclasses.replace(f, R=Ro[i], t=to[i])
        return cost

    def optimize_sim3(self, n_iters: int = 12) -> float:
        """Scale-drift-aware Sim(3) pose graph over the trajectory (the
        monocular loop-closure correction: loop edges carry the measured
        relative scale, so accumulated scale drift is distributed around
        the cycle).  Updates frame poses with the scale baked into the
        translations (t <- t/s, preserving camera centres in one
        consistent global scale).  Returns the final summed residual."""
        from .sim3graph import optimize_with_loops_sim3
        if len(self.frames) < 3 or not self.loops:
            return 0.0
        s, Ro, to, _, cost = optimize_with_loops_sim3(
            self.frames, self.loops, self.frame_depths, n_iters=n_iters,
            min_gap=self.loop_min_gap)
        for i, f in enumerate(self.frames):
            self.frames[i] = dataclasses.replace(
                f, R=Ro[i], t=to[i] / max(float(s[i]), 1e-12))
        return cost
