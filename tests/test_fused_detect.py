"""Parity of the fused per-octave detection kernel (ops/fused_detect.py)
against the XLA pyramid + NMS formulation it replaces.

The fused kernel recomputes the decimation-seeded layers of octaves > 0
directly from its own octave's phase planes, so these tests cover both
the layer values (FMA-contraction drift only) and exact mask equality,
including the multi-band split used when an octave exceeds the VMEM
budget.  Kernels run under the Pallas interpreter on CPU; the real-TPU
behaviour is covered by the hardware lane (SURF_TPU_TESTS=1 golden /
oracle tests) and bench.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_surf_tpu import SurfConfig
from cuda_surf_tpu.ops.integral import integral_image, phase_planes_packed
from cuda_surf_tpu.ops.hessian import response_pyramid
from cuda_surf_tpu.ops.extrema import _candidate_mask, detect
from cuda_surf_tpu.ops import fused_detect as fd
from conftest import KERNEL_INTERPRET, kernel_detect_backend


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(7)
    # smooth random texture (pure noise yields almost no extrema)
    base = rng.integers(0, 256, (30, 40), np.uint8)
    up = np.kron(base, np.ones((8, 8), np.uint8))
    noise = rng.integers(0, 32, up.shape).astype(np.uint8)
    return np.clip(up.astype(np.int32) + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def cfg():
    return SurfConfig(noctaves=4, thresh=4.0, upright=True,
                      detect_backend=kernel_detect_backend())


def _reference(img, cfg):
    h, w = img.shape
    imj = jnp.asarray(img)
    pyr = response_pyramid(integral_image(imj), cfg, h, w, img=None)
    sched = cfg.hessian_schedule(h, w)
    masks = [_candidate_mask(p, sched[o], cfg) for o, p in enumerate(pyr)]
    return pyr, masks


def test_layers_and_masks_match_xla(img, cfg):
    h, w = img.shape
    pyr_ref, masks_ref = _reference(img, cfg)
    pyr_f, masks_f = fd.fused_pyramid(jnp.asarray(img), cfg, h, w,
                                      interpret=KERNEL_INTERPRET)
    n_cand = 0
    for o in range(cfg.noctaves):
        a, b = np.asarray(pyr_ref[o]), np.asarray(pyr_f[o])
        scale = np.maximum(np.abs(a), 1.0)
        assert np.max(np.abs(a - b) / scale) < 1e-5, o
        assert (np.asarray(masks_ref[o]) == np.asarray(masks_f[o])).all(), o
        n_cand += int(np.asarray(masks_f[o]).sum())
    assert n_cand > 10  # the fixture must actually exercise the NMS


def test_multiband_split_matches_single_band(img, cfg):
    h, w = img.shape
    sched = cfg.hessian_schedule(h, w)
    shapes = cfg.octave_shapes(h, w)
    for o in (0, 1):
        plan = fd.octave_plan(cfg, sched, shapes, o)
        planes = phase_planes_packed(jnp.asarray(img), plan["d"],
                                     plan["keys"], plan["hp"], plan["wq"])
        l1, c1 = fd.fused_octave(planes, plan, cfg, interpret=KERNEL_INTERPRET)
        ln, cn = fd.fused_octave(planes, plan, cfg, interpret=KERNEL_INTERPRET,
                                 max_band_bytes=64 * 1024)
        assert (np.asarray(l1) == np.asarray(ln)).all()
        assert (np.asarray(c1) == np.asarray(cn)).all()


def test_detect_pipeline_parity(img, cfg):
    """End-to-end detect(): fused masks + layers produce the same
    keypoints as the XLA backend (layer FMA drift must not flip any
    NMS/threshold decision on this fixture)."""
    h, w = img.shape
    sched = cfg.hessian_schedule(h, w)
    pyr_ref, _ = _reference(img, cfg)
    ref = detect(pyr_ref, sched, cfg)
    pyr_f, masks_f = fd.fused_pyramid(jnp.asarray(img), cfg, h, w,
                                      interpret=KERNEL_INTERPRET)
    out = detect(pyr_f, sched, cfg, cand_masks=masks_f)
    assert int(ref["count"]) == int(out["count"])
    v = np.asarray(ref["valid"])
    assert (v == np.asarray(out["valid"])).all()
    for k in ("nx", "ny", "ns", "strength"):
        a, b = np.asarray(ref[k])[v], np.asarray(out[k])[v]
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4), k
