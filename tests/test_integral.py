import functools

import numpy as np
import jax
import jax.numpy as jnp

import oracle
from cuda_surf_tpu.ops.integral import box_sum, wavelet_dx, wavelet_dy
from cuda_surf_tpu.ops import integral as integral_mod

integral_image = jax.jit(integral_mod.integral_image,
                         static_argnames=("doubled",))


def test_integral_matches_bruteforce(rng):
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    ii = np.asarray(integral_image(jnp.asarray(img)))
    assert ii.shape == (38, 54)
    assert (ii[0] == 0).all() and (ii[:, 0] == 0).all()
    for (y, x) in [(1, 1), (5, 9), (37, 53), (20, 30)]:
        assert ii[y, x] == img[:y, :x].sum()


def test_integral_matches_oracle(small_image):
    got = np.asarray(integral_image(jnp.asarray(small_image)))
    want = oracle.integral_image(small_image)
    np.testing.assert_array_equal(got, want)


def test_integral_doubled_matches_oracle(rng):
    img = rng.integers(0, 256, (23, 31), dtype=np.uint8)
    got = np.asarray(integral_image(jnp.asarray(img), doubled=True))
    want = oracle.integral_image(img, doubled=True)
    assert got.shape == (2 * 23 - 1 + 1, 2 * 31 - 1 + 1)
    np.testing.assert_array_equal(got, want)


def test_box_sum_semantics(rng):
    img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    ii = integral_image(jnp.asarray(img))
    # inclusive box over cols [x2..x1], rows [y2..y1]
    got = int(box_sum(ii, 12, 15, 4, 6))
    want = int(img[6:16, 4:13].sum())
    assert got == want


def test_wavelets_match_oracle(rng):
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    ii_np = oracle.integral_image(img)
    ii = jnp.asarray(ii_np)
    for (x, y, s) in [(10, 10, 3), (20, 25, 5), (15, 30, 2)]:
        assert int(wavelet_dx(ii, x, y, s)) == int(oracle.wavelet_dx(ii_np, x, y, s))
        assert int(wavelet_dy(ii, x, y, s)) == int(oracle.wavelet_dy(ii_np, x, y, s))
