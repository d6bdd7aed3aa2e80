"""Loop-detector appearance prescreen: bounded verifications per query
with the same closures found as exhaustive verification.

The detector is exercised directly on a synthetic 200-frame out-and-back
trajectory with locally-visible landmarks (running the full image
pipeline for 200 frames is a sequence-level concern, covered by
test_slam_sequence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_surf_tpu.types import Keypoints
from cuda_surf_tpu.slam.loopclosure import LoopDetector
from cuda_surf_tpu.slam.tracking import Intrinsics


CAP = 256          # keypoint capacity per frame
N_LMK = 2000       # landmarks along the strip (80 per unit length)
# Half-width of each frame's visibility window.  With 0.25 frame
# spacing, frames share ~68 landmarks at distance 1 frame, ~48 at 2 —
# so at min_inliers=60 only the revisit partner and its +-1 neighbours
# verify (<= 3 candidates per query, exactly the prescreen budget).
VIS = 0.55


def _make_frames(n_fwd):
    """Out-and-back camera sliding along x over a landmark strip.

    Every landmark keeps one random unit descriptor for the whole
    sequence, so frames seeing the same landmarks match perfectly and
    RANSAC verifies genuinely overlapping (revisit) pairs only."""
    rng = np.random.default_rng(7)
    X = np.stack([np.linspace(0, 0.25 * n_fwd, N_LMK),
                  rng.uniform(-1.5, 1.5, N_LMK),
                  rng.uniform(5.0, 9.0, N_LMK)], axis=1)
    desc_bank = rng.normal(size=(N_LMK, 64)).astype(np.float32)
    desc_bank /= np.linalg.norm(desc_bank, axis=1, keepdims=True)
    lap_bank = np.where(rng.uniform(size=N_LMK) < 0.5, 1, -1).astype(np.int32)

    intr = Intrinsics(fx=400.0, fy=400.0, cx=320.0, cy=240.0)
    cam_x = [0.25 * k for k in range(n_fwd)]
    cam_x += cam_x[-2::-1]                      # out and back

    frames = []
    for cx in cam_x:
        vis = np.flatnonzero(np.abs(X[:, 0] - cx) < VIS)[:CAP]
        k = len(vis)
        x = np.zeros(CAP, np.float32)
        y = np.zeros(CAP, np.float32)
        desc = np.zeros((CAP, 64), np.float32)
        lap = np.ones(CAP, np.int32)
        xc = X[vis] - np.array([cx, 0.0, 0.0])
        x[:k] = intr.fx * xc[:, 0] / xc[:, 2] + intr.cx
        y[:k] = intr.fy * xc[:, 1] / xc[:, 2] + intr.cy
        desc[:k] = desc_bank[vis]
        lap[:k] = lap_bank[vis]
        valid = np.arange(CAP) < k
        kps = Keypoints(
            x=jnp.asarray(x), y=jnp.asarray(y),
            scale=jnp.full(CAP, 2.0, jnp.float32),
            strength=jnp.ones(CAP, jnp.float32),
            laplace=jnp.asarray(lap),
            ori=jnp.zeros(CAP, jnp.float32),
            octave=jnp.zeros(CAP, jnp.int32),
            valid=jnp.asarray(valid),
            count=jnp.asarray(k, jnp.int32))
        frames.append((kps, jnp.asarray(desc)))
    return frames, intr


@pytest.fixture(scope="module")
def strip_frames():
    return _make_frames(n_fwd=100)           # 199 frames total


def _run(det, frames):
    closures = []
    for kps, desc in frames:
        det.add(kps, desc)
        closures += det.query()
    return closures


def test_prescreen_bounds_verifications(strip_frames):
    frames, intr = strip_frames
    det = LoopDetector(intr, min_gap=20, min_inliers=30,
                       prescreen_topk=3)
    closures = _run(det, frames)
    n = len(frames)
    assert det.n_verifications <= 3 * n      # <= topk per query
    # revisit pairs (i, 2*(n_fwd-1)-i) must be found
    assert len(closures) >= 20
    assert all(lc.j - lc.i >= 20 for lc in closures)
    span = 2 * (100 - 1)
    good = sum(1 for lc in closures if abs((lc.i + lc.j) - span) <= 8)
    assert good >= 0.8 * len(closures)


@pytest.mark.slow
def test_prescreen_matches_exhaustive(strip_frames):
    """On a shorter sequence, the prescreen must find the same closure
    pairs as exhaustive verification."""
    frames, intr = strip_frames
    short = frames[:40] + frames[-39:]       # out-and-back subset
    ex = LoopDetector(intr, min_gap=20, min_inliers=60,
                      prescreen_topk=None)
    pre = LoopDetector(intr, min_gap=20, min_inliers=60,
                       prescreen_topk=3)
    c_ex = _run(ex, short)
    c_pre = _run(pre, short)
    assert ex.n_verifications > pre.n_verifications
    pairs_ex = {(lc.i, lc.j) for lc in c_ex}
    pairs_pre = {(lc.i, lc.j) for lc in c_pre}
    # per-pair verification keys are deterministic (fold_in on (i, j)),
    # so every prescreen-selected pair gets the identical verdict: the
    # prescreen result must be an exact subset...
    assert pairs_pre <= pairs_ex
    # ...and must not miss the CLEAR closures (comfortably above the
    # inlier threshold; borderline pairs may legitimately be outside
    # the top-k prescreen candidates)
    strong = {(lc.i, lc.j) for lc in c_ex if lc.n_inliers >= 75}
    assert strong and strong <= pairs_pre
