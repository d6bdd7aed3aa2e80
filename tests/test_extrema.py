import numpy as np
import jax
import jax.numpy as jnp

import oracle
from cuda_surf_tpu.config import SurfConfig
from cuda_surf_tpu.ops.extrema import solve3, detect_octave
from cuda_surf_tpu.ops.hessian import response_pyramid
from cuda_surf_tpu.ops.integral import integral_image


def test_solve3_matches_numpy(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A + A.transpose(0, 2, 1)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(jax.jit(jax.vmap(solve3))(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.solve(A.astype(np.float64),
                           b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_solve3_singular_gives_nonfinite():
    A = jnp.zeros((3, 3), jnp.float32)
    b = jnp.ones(3, jnp.float32)
    got = np.asarray(jax.jit(solve3)(A, b))
    assert not np.isfinite(got).all()


def _detect_jax(img, cfg):
    h, w = img.shape

    @jax.jit
    def run(img):
        ii = integral_image(img)
        pyr = response_pyramid(ii, cfg, h, w)
        sched = cfg.hessian_schedule(h, w)
        return [detect_octave(pyr[o], sched[o], cfg)
                for o in range(cfg.noctaves)]

    cands = jax.device_get(run(jnp.asarray(img)))
    out = []
    for o, cand in enumerate(cands):
        v = np.asarray(cand["valid"])
        for idx in np.nonzero(v)[0]:
            out.append((
                o,
                float(cand["nx"][idx]), float(cand["ny"][idx]),
                float(cand["ns"][idx]), float(cand["strength"][idx]),
            ))
    return out


def test_detection_matches_oracle(small_image):
    cfg = SurfConfig(noctaves=3, candidates_per_octave=1024)
    h, w = small_image.shape
    ii_np = oracle.integral_image(small_image)
    pyr = oracle.response_pyramid(ii_np, cfg, h, w)
    want = oracle.detect(ii_np, pyr, cfg, h, w)
    got = _detect_jax(small_image, cfg)
    assert len(want) > 3, "test image must produce keypoints"
    assert len(got) == len(want)
    # match as sets on (octave, x, y) within tolerance
    got_sorted = sorted(got, key=lambda t: (t[0], t[2], t[1]))
    want_sorted = sorted(
        [(p.octave, p.x / (cfg.sampling * cfg.divisor),
          p.y / (cfg.sampling * cfg.divisor),
          p.scale / (1.2 * cfg.divisor), p.strength) for p in want],
        key=lambda t: (t[0], t[2], t[1]))
    for g, wnt in zip(got_sorted, want_sorted):
        assert g[0] == wnt[0]
        np.testing.assert_allclose(g[1:4], wnt[1:4], rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(g[4], wnt[4], rtol=1e-3)


def test_detection_respects_threshold(small_image):
    cfg_hi = SurfConfig(noctaves=2, thresh=1000.0, candidates_per_octave=256)
    got = _detect_jax(small_image, cfg_hi)
    cfg_lo = SurfConfig(noctaves=2, thresh=1.0, candidates_per_octave=1024)
    got_lo = _detect_jax(small_image, cfg_lo)
    assert len(got) < len(got_lo)


def test_sparse_fit_matches_dense():
    """detect_fit='sparse' (per-candidate stencil gathers) must be
    numerically identical to the dense every-position fit maps on a
    realistic multi-octave detect (hardware A/B knob, ops/extrema.py)."""
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from cuda_surf_tpu import SurfConfig
    from cuda_surf_tpu.ops.integral import integral_image
    from cuda_surf_tpu.ops.hessian import response_pyramid
    from cuda_surf_tpu.ops import extrema

    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (160, 224))
           + 60 * np.sin(np.linspace(0, 40, 224))[None, :]).astype(np.uint8)
    cfg = SurfConfig(noctaves=3, thresh=1.0, max_pts=1024,
                     candidates_per_octave=1024)
    ii = integral_image(jnp.asarray(img), cfg.doubled)
    pyr = response_pyramid(ii, cfg, *img.shape)
    sched = cfg.hessian_schedule(*img.shape)
    d = extrema.detect(pyr, sched, cfg)
    cfg_s = dataclasses.replace(cfg, detect_fit="sparse")
    s = extrema.detect(pyr, sched, cfg_s)
    assert int(d["count"]) == int(s["count"]) and int(d["count"]) > 50
    vd, vs = np.asarray(d["valid"]), np.asarray(s["valid"])
    np.testing.assert_array_equal(vd, vs)
    for k in ("nx", "ny", "ns", "strength"):
        np.testing.assert_allclose(np.asarray(d[k])[vd],
                                   np.asarray(s[k])[vs], rtol=0, atol=0)
