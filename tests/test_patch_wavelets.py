"""Pallas patch-wavelet kernel vs the direct box-sum formulas.

Runs the TPU kernel in interpreter mode on CPU so the exact-selection
matmul machinery (bucketing, patch DMA, limb decomposition) is covered
in CI without hardware (SURVEY.md section 4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_surf_tpu.ops.patch_wavelets import wavelet_grids, bucket_specs
from conftest import KERNEL_INTERPRET, kernel_wavelet_method


def _integral(img):
    ii = np.zeros((img.shape[0] + 1, img.shape[1] + 1), np.int64)
    ii[1:, 1:] = img.astype(np.int64).cumsum(0).cumsum(1)
    return ii


def _boxsum(ii, x1, y1, x2, y2):
    return ii[y1 + 1, x1 + 1] + ii[y2, x2] - ii[y2, x1 + 1] - ii[y1 + 1, x2]


def _wdy(ii, x, y, s):
    return (_boxsum(ii, x + s, y, x - s, y - s)
            - _boxsum(ii, x + s, y + s, x - s, y))


def _wdx(ii, x, y, s):
    return (_boxsum(ii, x + s, y + s, x, y - s)
            - _boxsum(ii, x, y + s, x - s, y - s))


def test_wavelet_grids_match_box_sums(rng):
    img = rng.integers(0, 256, (96, 160), np.uint8)
    ii = _integral(img)
    H, W = ii.shape
    iij = jnp.asarray(ii.astype(np.int32))

    K, R = 12, 8
    ix = rng.integers(8, W - 8, K).astype(np.int32)
    iy = rng.integers(8, H - 8, K).astype(np.int32)
    step = rng.integers(1, 5, K).astype(np.int32)
    iscale = (2 * step + rng.integers(0, 3, K)).astype(np.int32)
    irad = rng.integers(4, R + 1, K).astype(np.int32)
    valid = np.ones(K, bool)
    valid[-1] = False
    max_span = int((irad * step + iscale + 1).max())

    dyg, dxg = jax.jit(lambda *a: wavelet_grids(
        *a, R=R, max_span=max_span, interpret=KERNEL_INTERPRET))(
        iij, jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(step),
        jnp.asarray(iscale), jnp.asarray(irad), jnp.asarray(valid))
    dyg, dxg = np.asarray(dyg), np.asarray(dxg)
    assert dyg.shape == (K, 2 * R + 1, 2 * R + 1)

    for k in range(K - 1):
        s, st, rad = int(iscale[k]), int(step[k]), int(irad[k])
        for i in range(-R, R + 1):
            for j in range(-R, R + 1):
                r = int(iy[k]) + i * st
                c = int(ix[k]) + j * st
                if (abs(i) <= rad and abs(j) <= rad and r - s >= 0
                        and r + s + 1 <= H - 1 and c - s >= 0
                        and c + s + 1 <= W - 1):
                    assert dyg[k, i + R, j + R] == _wdy(ii, c, r, s), (k, i, j)
                    assert dxg[k, i + R, j + R] == _wdx(ii, c, r, s), (k, i, j)
    # invalid keypoint comes back all-zero
    assert np.all(dyg[-1] == 0) and np.all(dxg[-1] == 0)


def test_bucket_overflow_cascades(rng):
    """Keypoints beyond a bucket's capacity spill into the next bucket
    (whose larger patch covers any smaller span) instead of dropping."""
    img = rng.integers(0, 256, (200, 320), np.uint8)
    iij = jnp.asarray(_integral(img).astype(np.int32))

    K, R = 24, 8
    ix = rng.integers(70, 250, K).astype(np.int32)
    iy = rng.integers(70, 130, K).astype(np.int32)
    step = rng.integers(1, 3, K).astype(np.int32)
    iscale = (2 * step + rng.integers(0, 3, K)).astype(np.int32)
    irad = rng.integers(4, R + 1, K).astype(np.int32)
    # one large-span keypoint forces a second bucket to exist
    step[22], irad[22], iscale[22] = 5, 8, 20
    valid = np.ones(K, bool)
    valid[23] = False
    max_span = int((irad * step + iscale + 1).max())

    def run(caps):
        dy, dx = jax.jit(lambda *a: wavelet_grids(
            *a, R=R, max_span=max_span, caps=caps, interpret=KERNEL_INTERPRET))(
            iij, jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(step),
            jnp.asarray(iscale), jnp.asarray(irad), jnp.asarray(valid))
        return np.asarray(dy), np.asarray(dx)

    dy_full, dx_full = run(None)               # ample capacity
    dy_ovf, dx_ovf = run([16, 16])             # bucket 0 overflows
    assert np.any(dy_full != 0)
    np.testing.assert_array_equal(dy_ovf, dy_full)
    np.testing.assert_array_equal(dx_ovf, dx_full)


def test_streaming_path_matches_resident(rng):
    """The banded-DMA streaming kernel (used when the image's limb
    planes exceed the VMEM budget, e.g. doubled mode at full res) and
    the resident-limb kernel return identical grids."""
    img = rng.integers(0, 256, (120, 200), np.uint8)
    iij = jnp.asarray(_integral(img).astype(np.int32))

    K, R = 16, 8
    ix = rng.integers(10, 190, K).astype(np.int32)
    iy = rng.integers(10, 110, K).astype(np.int32)
    step = rng.integers(1, 5, K).astype(np.int32)
    iscale = (2 * step + rng.integers(0, 3, K)).astype(np.int32)
    irad = rng.integers(4, R + 1, K).astype(np.int32)
    valid = np.ones(K, bool)
    valid[-1] = False
    max_span = int((irad * step + iscale + 1).max())

    def run(res):
        dy, dx = jax.jit(lambda *a: wavelet_grids(
            *a, R=R, max_span=max_span, interpret=KERNEL_INTERPRET, resident=res))(
            iij, jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(step),
            jnp.asarray(iscale), jnp.asarray(irad), jnp.asarray(valid))
        return np.asarray(dy), np.asarray(dx)

    dy_r, dx_r = run(True)
    dy_s, dx_s = run(False)
    assert np.any(dy_r != 0)
    np.testing.assert_array_equal(dy_s, dy_r)
    np.testing.assert_array_equal(dx_s, dx_r)


def test_bucket_specs_cover_span():
    specs = bucket_specs(968, 1408, 511)
    assert specs[-1][0] >= 511
    # extents are tile-aligned and within the padded image
    for lim, er, ec in specs:
        assert er % 8 == 0 and ec % 128 == 0
        assert er <= 968 and ec <= 1408


def test_describe_pallas_interpret_matches_gather(small_image):
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.frontend import detect_and_compute

    cfgA = SurfConfig(noctaves=2, max_pts=256, candidates_per_octave=512,
                      wavelet_method="gather")
    cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
    img = jnp.asarray(small_image)
    kpA, dA = jax.jit(lambda im: detect_and_compute(im, cfgA))(img)
    kpB, dB = jax.jit(lambda im: detect_and_compute(im, cfgB))(img)
    v = np.asarray(kpA.valid)
    assert int(kpA.count) == int(kpB.count)
    np.testing.assert_allclose(np.asarray(dA)[v], np.asarray(dB)[v],
                               atol=1e-6)


def test_extended_descriptor_pallas_interpret(small_image):
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.frontend import detect_and_compute

    cfgA = SurfConfig(noctaves=2, max_pts=256, candidates_per_octave=512,
                      extended=True, wavelet_method="gather")
    cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
    img = jnp.asarray(small_image)
    kpA, dA = jax.jit(lambda im: detect_and_compute(im, cfgA))(img)
    kpB, dB = jax.jit(lambda im: detect_and_compute(im, cfgB))(img)
    assert dA.shape[-1] == 128
    v = np.asarray(kpA.valid)
    np.testing.assert_allclose(np.asarray(dA)[v], np.asarray(dB)[v],
                               atol=1e-5)


def test_doubled_descriptor_pallas_interpret(small_image):
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.frontend import detect_and_compute

    cfgA = SurfConfig(noctaves=2, max_pts=256, candidates_per_octave=512,
                      doubled=True, wavelet_method="gather")
    cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
    img = jnp.asarray(small_image[:64, :80])
    kpA, dA = jax.jit(lambda im: detect_and_compute(im, cfgA))(img)
    kpB, dB = jax.jit(lambda im: detect_and_compute(im, cfgB))(img)
    assert int(kpA.count) == int(kpB.count)
    v = np.asarray(kpA.valid)
    np.testing.assert_allclose(np.asarray(dA)[v], np.asarray(dB)[v],
                               atol=1e-5)


def test_orientation_pallas_interpret_matches_gather(small_image):
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.frontend import detect_and_compute

    cfgA = SurfConfig(noctaves=2, max_pts=256, candidates_per_octave=512,
                      upright=False, wavelet_method="gather")
    cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
    img = jnp.asarray(small_image)
    kpA, dA = jax.jit(lambda im: detect_and_compute(im, cfgA))(img)
    kpB, dB = jax.jit(lambda im: detect_and_compute(im, cfgB))(img)
    v = np.asarray(kpA.valid)
    np.testing.assert_allclose(np.asarray(kpA.ori)[v],
                               np.asarray(kpB.ori)[v], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dA)[v], np.asarray(dB)[v],
                               atol=1e-5)


@pytest.mark.slow
def test_nondefault_config_parity(small_image):
    """Non-default descriptor window / mask sizes through the kernel."""
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.frontend import detect_and_compute

    for kw in (dict(desc_wsz=3), dict(init_mask_size=15)):
        cfgA = SurfConfig(noctaves=2, max_pts=256, candidates_per_octave=512,
                          wavelet_method="gather", **kw)
        cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
        img = jnp.asarray(small_image)
        kpA, dA = jax.jit(lambda im, c=cfgA: detect_and_compute(im, c))(img)
        kpB, dB = jax.jit(lambda im, c=cfgB: detect_and_compute(im, c))(img)
        assert int(kpA.count) == int(kpB.count), kw
        v = np.asarray(kpA.valid)
        np.testing.assert_allclose(np.asarray(dA)[v], np.asarray(dB)[v],
                                   atol=1e-5, err_msg=str(kw))


def test_supertile_seam_keypoints(rng):
    """Descriptors for keypoints planted on tile-interior boundaries
    (the shared-tile kernel's ownership/margin edges) match the gather
    path exactly — pins the tile margin arithmetic."""
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.ops.descriptor import describe

    img = rng.integers(0, 256, (300, 700), np.uint8)
    ii = jnp.asarray(_integral(img).astype(np.int32))

    # seam rows/cols of the (256, 512) level-0 tiles: interiors start at
    # margin 64 and advance by TI_R=128 / TI_C=384
    ys = [63, 64, 65, 191, 192, 193, 290]
    xs = [63, 64, 65, 447, 448, 449, 690]
    y, x = np.meshgrid(ys, xs, indexing="ij")
    y = y.ravel().astype(np.float64) + 0.3
    x = x.ravel().astype(np.float64) - 0.2
    # scales spanning the supertile cap and the bucketed fallback
    scale = np.resize([2.5, 3.8, 6.0, 9.5], y.shape)
    valid = np.ones(y.shape, bool)
    ori = np.zeros_like(y)

    cfgA = SurfConfig(noctaves=2, max_pts=y.size, wavelet_method="gather")
    cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
    dA = jax.jit(lambda: describe(
        ii, cfgA, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(scale, jnp.float32), jnp.asarray(ori, jnp.float32),
        jnp.asarray(valid)))()
    dB = jax.jit(lambda: describe(
        ii, cfgB, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.asarray(scale, jnp.float32), jnp.asarray(ori, jnp.float32),
        jnp.asarray(valid)))()
    np.testing.assert_allclose(np.asarray(dA), np.asarray(dB), atol=2e-6)


def test_step_decimated_descriptor_parity(rng):
    """The step-decimated kernels (disabled by default — see DEC_STEPS
    in ops/patch_wavelets.py — but kept for the multi-step revisit)
    must match the bucketed fallback exactly, including keypoints near
    image borders and the step tail that stays bucketed."""
    import dataclasses
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.ops import patch_wavelets as pw
    from cuda_surf_tpu.ops.descriptor import describe

    img = rng.integers(0, 256, (360, 520), np.uint8)
    ii = jnp.asarray(_integral(img).astype(np.int32))

    # scales chosen so steps cover 4..9 (work = 1.65*scale, step =
    # round(work/2)); duplicated at interior and border positions
    scales = [4.5, 5.6, 6.8, 8.0, 9.2, 10.4, 11.0]
    xs = [60.3, 250.0, 510.5, 30.2, 400.8, 200.1, 8.0]
    ys = [55.7, 180.4, 300.9, 352.5, 12.3, 150.6, 355.0]
    x = np.array(xs * 2, np.float32)
    y = np.array(ys * 2, np.float32)
    scale = np.array(scales * 2, np.float32)
    valid = np.ones(x.shape, bool)
    valid[-1] = False
    ori = np.zeros_like(x)

    cfgA = SurfConfig(noctaves=4, max_pts=x.size, wavelet_method="gather")
    cfgB = dataclasses.replace(cfgA, wavelet_method=kernel_wavelet_method())
    args = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(scale),
            jnp.asarray(ori), jnp.asarray(valid))
    dA = jax.jit(lambda: describe(ii, cfgA, *args))()

    dec_steps = (4, 5, 6, 7, 8)
    orig = pw.DEC_STEPS
    pw.DEC_STEPS = dec_steps
    try:
        dB = jax.jit(lambda: describe(ii, cfgB, *args))()
    finally:
        pw.DEC_STEPS = orig
    np.testing.assert_allclose(np.asarray(dA), np.asarray(dB), atol=2e-6)
    assert np.any(np.asarray(dB) != 0)
