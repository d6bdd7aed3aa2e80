"""Data-parallel frontend over the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuda_surf_tpu import SurfConfig, Surf
from cuda_surf_tpu.parallel import BatchSurf, make_mesh


pytestmark = pytest.mark.cpu_only  # needs the 8-device virtual CPU mesh


def test_batch_surf_matches_single(small_image, rng):
    n = len(jax.devices())
    imgs = np.stack([np.roll(small_image, 3 * i, axis=1)
                     for i in range(n)])
    cfg = SurfConfig(noctaves=2, max_pts=256, candidates_per_octave=512)
    bsurf = BatchSurf(cfg, mesh=make_mesh())
    kps, descs = bsurf.detect_and_compute(imgs)
    assert descs.shape == (n, cfg.max_pts, cfg.nfeatures)

    surf = Surf(cfg)
    for i in (0, n - 1):
        kp1, d1 = surf.detect_and_compute(imgs[i])
        assert int(kps.count[i]) == int(kp1.count)
        v = np.asarray(kp1.valid)
        np.testing.assert_allclose(np.asarray(descs[i])[v],
                                   np.asarray(d1)[v], atol=1e-6)

    m = bsurf.match(kps, descs, kps, descs)
    # self-match: every valid keypoint matches itself with score ~1
    idx = np.asarray(m.index)
    for i in range(n):
        valid = np.asarray(kps.valid[i])
        assert (idx[i][valid] == np.nonzero(valid)[0]).mean() > 0.9
