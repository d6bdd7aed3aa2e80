"""Frame-to-frame tracking: SURF match + ratio filter + RANSAC pose.

Combines the frontend (reference capability) with the new two-view
geometry backend.  The matcher itself applies no rejection (parity with
findMaxCorr, surfd.cu:2665-2669); the SLAM layer filters by the recorded
`ambiguity` ratio and by Laplacian-sign agreement before RANSAC.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..types import Keypoints, Matches
from ..ops.matcher import match_keypoints
from ..geometry.epipolar import ransac_essential, normalize_with_intrinsics


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float


class TrackResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray     # (N1,) bool over kp1 slots
    n_inliers: jnp.ndarray
    matches: Matches
    points3d: jnp.ndarray    # (N1, 3) triangulated, cam1 frame


def default_intrinsics(h: int, w: int) -> Intrinsics:
    f = 0.9 * max(h, w)
    return Intrinsics(fx=f, fy=f, cx=w / 2.0, cy=h / 2.0)


def track_pair(kp1: Keypoints, desc1, kp2: Keypoints, desc2,
               intr: Intrinsics, key, ratio: float = 0.95,
               n_hypotheses: int | None = None,
               inlier_thresh: float = 2e-5,
               solver: str = "5pt") -> TrackResult:
    """Default solver is the Nister 5-point: its hypotheses live ON the
    essential manifold, so consensus ranking is honest.  8-point minimal
    fits on quasi-planar scenes produce F far off the manifold with
    inflated Sampson support, and the decomposed pose can be tens of
    degrees wrong (observed 30-67 deg tdir error on the terrain
    sequence; <5 deg with 5pt)."""
    if n_hypotheses is None:
        # each 5pt sample yields up to 10 manifold hypotheses
        n_hypotheses = 128 if solver == "5pt" else 512
    m = match_keypoints(kp1, desc1, kp2, desc2)
    lap2 = kp2.laplace[m.index]
    good = (m.valid & (m.ambiguity < ratio) & (kp1.laplace == lap2))
    x1 = normalize_with_intrinsics(jnp.stack([kp1.x, kp1.y], -1),
                                   intr.fx, intr.fy, intr.cx, intr.cy)
    x2 = normalize_with_intrinsics(jnp.stack([m.match_x, m.match_y], -1),
                                   intr.fx, intr.fy, intr.cx, intr.cy)
    res = ransac_essential(x1, x2, good, key,
                           n_hypotheses=n_hypotheses,
                           inlier_thresh=inlier_thresh, solver=solver)
    return TrackResult(R=res.R, t=res.t, inliers=res.inliers,
                       n_inliers=res.n_inliers, matches=m,
                       points3d=res.points3d)
