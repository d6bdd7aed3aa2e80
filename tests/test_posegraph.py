"""Pose-graph optimizer: dense/CG solver parity and large-graph scaling.

The reference has no pose-graph backend (SURVEY.md section 2.5 — no
distributed or global-optimization components at all); this covers the
new capability's two solve paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cuda_surf_tpu.slam.posegraph import PoseGraph, optimize
from cuda_surf_tpu.geometry.pose import exp_so3


def _circle_graph(n, n_loops, rng, drift=0.02):
    """Ground-truth circle trajectory with odometry drift + loop edges."""
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    Rs, ts = [], []
    for k in range(n):
        c, s = np.cos(th[k]), np.sin(th[k])
        Rs.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]))
        ts.append(np.array([10 * c, 10 * s, 0.0]))
    Rs, ts = np.stack(Rs), np.stack(ts)
    ei = list(range(n - 1))
    ej = list(range(1, n))
    li = rng.integers(0, n // 2, n_loops)
    ei += list(li)
    ej += list(li + n // 2)
    ei, ej = np.asarray(ei, np.int32), np.asarray(ej, np.int32)
    rel_R = np.einsum("eji,ejk->eik", Rs[ei], Rs[ej])
    rel_t = np.einsum("eji,ej->ei", Rs[ei], ts[ej] - ts[ei])
    # integrate the odometry chain with noise for the initial guess
    Rn, tn = [Rs[0]], [ts[0]]
    for k in range(1, n):
        dR = np.asarray(exp_so3(jnp.asarray(
            rng.normal(0, drift / 10, 3), jnp.float32)))
        Rn.append(Rn[-1] @ rel_R[k - 1] @ dR)
        tn.append(tn[-1] + Rn[-2] @ rel_t[k - 1]
                  + rng.normal(0, drift, 3))
    g = PoseGraph(jnp.asarray(np.stack(Rn), jnp.float32),
                  jnp.asarray(np.stack(tn), jnp.float32),
                  jnp.asarray(ei), jnp.asarray(ej),
                  jnp.asarray(rel_R, jnp.float32),
                  jnp.asarray(rel_t, jnp.float32),
                  jnp.ones(len(ei), jnp.float32))
    return g, Rs, ts


def test_dense_and_cg_solvers_agree(rng):
    g, Rs, ts = _circle_graph(24, 4, rng)
    gd, cd = jax.jit(lambda g: optimize(g, n_iters=8, solver="dense"))(g)
    gc, cc = jax.jit(lambda g: optimize(g, n_iters=8, solver="cg"))(g)
    np.testing.assert_allclose(np.asarray(gd.t), np.asarray(gc.t),
                               atol=1e-4)
    assert float(cd[-1]) < 1e-8
    assert float(cc[-1]) < 1e-8
    # both recover the circle
    assert float(jnp.abs(gd.t - ts).max()) < 1e-3
    assert float(jnp.abs(gc.t - ts).max()) < 1e-3


def test_large_graph_cg(rng):
    """KITTI-length trajectory (n=600 nodes + 30 loop closures): the
    matrix-free CG path must run in O(E) memory (the old one-hot
    assembly needed a (4E, n^2) tensor ~ 5 GB here)."""
    n = 600
    g, Rs, ts = _circle_graph(n, 30, rng)
    err0 = float(jnp.abs(g.t - ts).max())
    go, costs = jax.jit(lambda g: optimize(g, n_iters=5))(g)
    err1 = float(jnp.abs(go.t - ts).max())
    assert np.isfinite(float(costs[-1]))
    assert float(costs[-1]) < 1e-3 * float(costs[0])
    assert err1 < 0.05 * err0
