"""Full-resolution golden regression on the reference stereo fixture.

Locks the end-to-end detector/descriptor/matcher behaviour on the
reference's own 1280x960 data (SURVEY.md section 4: demo-as-integration-
test).  The expected values (2739/3443 keypoints, mean match score
0.96497) are REFERENCE-TRUE: the independent native C++ oracle
(native/surforacle.cpp, a scalar re-derivation of the reference math
sharing no code with this framework) reproduces them exactly — see
tests/test_reference_oracle.py for the full cross-check (locations,
descriptors, Laplacian signs, orientations).
"""

import numpy as np
import jax
import pytest

from cuda_surf_tpu import Surf, SurfConfig
from cuda_surf_tpu.io import read_pgm


@pytest.mark.slow
def test_reference_pair_golden(left_image, right_image):
    surf = Surf(SurfConfig(noctaves=4, thresh=4.0, upright=True,
                           max_pts=4096, candidates_per_octave=4096))
    kp1, d1 = surf.detect_and_compute(left_image)
    kp2, d2 = surf.detect_and_compute(right_image)
    assert int(kp1.count) == 2739
    assert int(kp2.count) == 3443

    m = surf.match(kp1, d1, kp2, d2)
    score = np.asarray(m.score)
    valid = np.asarray(m.valid)
    mean_score = float(score[valid].mean())
    np.testing.assert_allclose(mean_score, 0.96497, atol=2e-4)

    # descriptors are unit-norm
    norms = np.linalg.norm(np.asarray(d1)[np.asarray(kp1.valid)], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # strongest keypoint is stable
    v = np.asarray(kp1.valid)
    i = int(np.argmax(np.where(v, np.asarray(kp1.strength), -1)))
    assert np.asarray(kp1.strength)[i] > 100.0
