import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cuda_surf_tpu.ba import BAProblem, BAState, cost, run_lm
from cuda_surf_tpu.ba import make_distributed_lm, shard_problem
from cuda_surf_tpu.parallel import make_mesh


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _make_problem(rng, n_cam=4, n_pts=64, noise=1e-3, perturb=0.05):
    m = n_cam
    X = rng.uniform([-2, -2, 6], [2, 2, 12], (n_pts, 3))
    Rs, ts, = [], []
    for c in range(n_cam):
        R = _rotmat([0, 1, 0], 0.05 * c)
        tvec = np.array([0.5 * c, 0.02 * c, 0.0])
        Rs.append(R)
        ts.append(-R @ tvec)  # world->cam with camera centre at tvec
    Rs, ts = np.stack(Rs), np.stack(ts)
    cam_idx = np.tile(np.arange(n_cam), (n_pts, 1))
    xc = np.einsum("cij,pj->pci", Rs, X) + ts[None]
    uv = xc[..., :2] / xc[..., 2:]
    uv += rng.normal(0, noise, uv.shape)
    mask = np.ones((n_pts, m), bool)
    prob = BAProblem(jnp.asarray(cam_idx, jnp.int32),
                     jnp.asarray(uv, jnp.float32), jnp.asarray(mask))
    # perturb initial state
    Rp = np.stack([_rotmat(rng.normal(size=3), perturb * rng.uniform())
                   @ Rs[c] for c in range(n_cam)])
    tp = ts + rng.normal(0, perturb, ts.shape)
    tp[0] = ts[0]
    Rp[0] = Rs[0]  # keep gauge camera exact
    Xp = X + rng.normal(0, perturb, X.shape)
    state = BAState(jnp.asarray(Rp, jnp.float32), jnp.asarray(tp, jnp.float32),
                    jnp.asarray(Xp, jnp.float32))
    truth = BAState(jnp.asarray(Rs, jnp.float32), jnp.asarray(ts, jnp.float32),
                    jnp.asarray(X, jnp.float32))
    return prob, state, truth


def test_lm_reduces_cost(rng):
    prob, state, truth = _make_problem(rng)
    c0 = float(cost(state, prob))
    run = jax.jit(lambda s, p: run_lm(s, p, n_iters=12))
    final, c1 = run(state, prob)
    c1 = float(c1)
    assert np.isfinite(c1)
    assert c1 < 0.02 * c0
    # near the noise floor: residual rms ~ noise
    n_res = float(np.asarray(prob.mask).sum() * 2)
    rms = np.sqrt(2 * c1 / n_res)
    assert rms < 5e-3


@pytest.mark.cpu_only  # needs the 8-device virtual CPU mesh
def test_distributed_lm_matches_single_device(rng):
    prob, state, truth = _make_problem(rng, n_pts=64)
    mesh = make_mesh(8)
    prob_s, state_s = shard_problem(prob, state, mesh)
    run_d = make_distributed_lm(mesh, n_cameras=4, n_iters=12)
    final_d, c_d = run_d(state_s, prob_s)
    final_1, c_1 = jax.jit(lambda s, p: run_lm(s, p, n_iters=12))(state, prob)
    assert np.isfinite(float(c_d))
    np.testing.assert_allclose(float(c_d), float(c_1), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(final_d.t), np.asarray(final_1.t),
                               atol=1e-3)


def test_huber_resists_outliers():
    import jax.numpy as jnp
    from cuda_surf_tpu.ba import BAProblem, BAState, run_lm

    rng = np.random.default_rng(42)

    n_cam, n_pts = 4, 64
    X = rng.uniform([-2, -2, 6], [2, 2, 12], (n_pts, 3))
    Rs = np.tile(np.eye(3), (n_cam, 1, 1)).astype(np.float32)
    ts = np.stack([np.array([0.4 * c, 0, 0]) for c in range(n_cam)]
                  ).astype(np.float32)
    cam_idx = np.tile(np.arange(n_cam, dtype=np.int32), (n_pts, 1))
    xc = np.einsum("cij,pj->pci", Rs, X) + ts[None]
    uv = (xc[..., :2] / xc[..., 2:]).astype(np.float32)
    uv += rng.normal(0, 5e-4, uv.shape)
    # 10% gross outliers
    n_out = n_pts * n_cam // 10
    flat = uv.reshape(-1, 2)
    idx = rng.choice(len(flat), n_out, replace=False)
    flat[idx] += rng.normal(0, 0.3, (n_out, 2))
    prob = BAProblem(jnp.asarray(cam_idx), jnp.asarray(uv),
                     jnp.ones((n_pts, n_cam), bool))
    state0 = BAState(jnp.asarray(Rs), jnp.asarray(ts + 0.02),
                     jnp.asarray(X + 0.05, jnp.float32))

    def pose_err(out):
        return float(np.linalg.norm(np.asarray(out.t) - ts))

    plain, _ = run_lm(state0, prob, n_iters=20)
    robust, _ = run_lm(state0, prob, n_iters=20, huber_delta=1e-3)
    # gross outliers wreck the quadratic fit; the Huber kernel shrugs
    assert pose_err(robust) < 0.2 * pose_err(plain)
    assert pose_err(robust) < 0.12


def test_lm_scales_to_many_cameras(rng):
    """C=32 cameras x 4096 points: the Schur assembly must stay linear
    in P*M*C (the old pair-tensor one-hot was O(P*M^2*C^2) memory)."""
    C, P, M = 32, 4096, 8
    X = rng.uniform([-4, -4, 6], [4, 4, 16], (P, 3))
    Rs = np.tile(np.eye(3), (C, 1, 1)).astype(np.float32)
    ts = np.stack([[0.2 * c, 0.01 * c, 0] for c in range(C)]
                  ).astype(np.float32)
    cam_idx = rng.integers(0, C, (P, M)).astype(np.int32)
    xc = np.einsum("cij,pj->pci", Rs, X)[
        np.arange(P)[:, None], cam_idx] + ts[cam_idx]
    uv = (xc[..., :2] / xc[..., 2:]).astype(np.float32)
    uv += rng.normal(0, 1e-3, (P, M, 2)).astype(np.float32)
    prob = BAProblem(jnp.asarray(cam_idx), jnp.asarray(uv),
                     jnp.ones((P, M), bool))
    state = BAState(
        jnp.asarray(Rs),
        jnp.asarray(ts + np.float32(rng.normal(0, 0.02, ts.shape))),
        jnp.asarray(X + rng.normal(0, 0.05, X.shape), jnp.float32))
    c0 = float(cost(state, prob))
    _, c1 = jax.jit(lambda s, p: run_lm(s, p, n_iters=8))(state, prob)
    assert np.isfinite(float(c1))
    assert float(c1) < 0.05 * c0
