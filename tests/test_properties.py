"""Property tests (SURVEY.md section 4): geometric equivariance of the
detector/descriptor under exact image transforms."""

import numpy as np
import jax
import pytest

from cuda_surf_tpu import Surf, SurfConfig


@pytest.fixture(scope="module")
def textured():
    """Multi-scale noise texture: plenty of stable blobs at many scales."""
    rng = np.random.default_rng(7)
    T = 192
    img = np.zeros((T, T))
    gy, gx = np.mgrid[0:T, 0:T].astype(np.float64)
    for cell in (6, 12, 24, 48):
        g = rng.normal(0, 1, (T // cell + 2, T // cell + 2))
        u, v = gx / cell, gy / cell
        u0, v0 = u.astype(int), v.astype(int)
        fu, fv = u - u0, v - v0
        img += (g[v0, u0] * (1 - fu) * (1 - fv)
                + g[v0, u0 + 1] * fu * (1 - fv)
                + g[v0 + 1, u0] * (1 - fu) * fv
                + g[v0 + 1, u0 + 1] * fu * fv)
    img = (img - img.min()) / (np.ptp(img) + 1e-9) * 255.0
    return img.astype(np.uint8)


def _kp_arrays(kps):
    v = np.asarray(kps.valid)
    return (np.asarray(kps.x)[v], np.asarray(kps.y)[v],
            np.asarray(kps.scale)[v], np.asarray(kps.ori)[v])


def _match_sets(ax, ay, bx, by, tol=1.0):
    """Fraction of a-points with a b-point within tol."""
    d2 = ((ax[:, None] - bx[None]) ** 2 + (ay[:, None] - by[None]) ** 2)
    return (d2.min(axis=1) < tol * tol).mean(), d2.argmin(axis=1)


def test_rot90_equivariance(textured):
    """Rotating the image 90 deg maps detections through the same
    rotation and shifts assigned orientations by pi/2."""
    surf = Surf(SurfConfig(noctaves=2, upright=False, thresh=1.0,
                           max_pts=512, candidates_per_octave=1024))
    h, w = textured.shape
    rot = np.ascontiguousarray(np.rot90(textured, k=-1))  # clockwise

    kp1, _ = surf.detect_and_compute(textured)
    kp2, _ = surf.detect_and_compute(rot)
    x1, y1, s1, o1 = _kp_arrays(jax.device_get(kp1))
    x2, y2, s2, o2 = _kp_arrays(jax.device_get(kp2))
    assert len(x1) > 20

    # clockwise rot90: (x, y) -> (h - 1 - y, x)
    ex, ey = (h - 1) - y1, x1
    frac, nn = _match_sets(ex, ey, x2, y2, tol=1.5)
    assert frac > 0.7, frac

    # orientation shifts by -pi/2 (image y is down); compare modulo 2pi
    matched = ((ex[:, None] - x2[None]) ** 2
               + (ey[:, None] - y2[None]) ** 2).min(1) < 2.25
    do = (o2[nn[matched]] - o1[matched])
    do = (do + np.pi) % (2 * np.pi) - np.pi
    med = np.median(np.abs(np.abs(do) - np.pi / 2))
    assert med < 0.2, med


def test_intensity_scale_invariance(textured):
    """Descriptors are L2-normalized: halving image contrast leaves
    matches intact."""
    surf = Surf(SurfConfig(noctaves=2, max_pts=512,
                           candidates_per_octave=1024, thresh=0.5))
    dim = (textured.astype(np.float32) * 0.5).astype(np.uint8)
    kp1, d1 = surf.detect_and_compute(textured)
    kp2, d2 = surf.detect_and_compute(dim)
    m = surf.match(kp1, d1, kp2, d2)
    v = np.asarray(kp1.valid)
    score = np.asarray(m.score)[v]
    assert np.median(score) > 0.95


def test_translation_equivariance(textured):
    """Shifting the image by whole pixels shifts detections exactly."""
    surf = Surf(SurfConfig(noctaves=2, max_pts=512, thresh=1.0,
                           candidates_per_octave=1024))
    dy, dx = 8, 16
    shifted = np.roll(np.roll(textured, dy, axis=0), dx, axis=1)
    kp1, _ = surf.detect_and_compute(textured)
    kp2, _ = surf.detect_and_compute(shifted)
    x1, y1, _, _ = _kp_arrays(jax.device_get(kp1))
    x2, y2, _, _ = _kp_arrays(jax.device_get(kp2))
    # interior points only (roll wraps the borders)
    h, w = textured.shape
    keep = ((x1 > 24) & (x1 < w - 24 - dx) & (y1 > 24) & (y1 < h - 24 - dy))
    frac, _ = _match_sets(x1[keep] + dx, y1[keep] + dy, x2, y2, tol=0.51)
    assert frac > 0.8, frac
