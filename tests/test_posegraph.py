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


def test_large_graph_cg():
    """KITTI-length trajectory (n=600 nodes + 30 loop closures): the
    matrix-free CG path must run in O(E) memory (the old one-hot
    assembly needed a (4E, n^2) tensor ~ 5 GB here).

    Uses a locally seeded rng: the session-scoped fixture's state
    depends on which tests ran before, which made this instance (and
    its convergence-after-5-LM-iters margin) vary per invocation."""
    n = 600
    g, Rs, ts = _circle_graph(n, 30, np.random.default_rng(7))
    err0 = float(jnp.abs(g.t - ts).max())
    go, costs = jax.jit(lambda g: optimize(g, n_iters=5))(g)
    err1 = float(jnp.abs(go.t - ts).max())
    assert np.isfinite(float(costs[-1]))
    assert float(costs[-1]) < 1e-3 * float(costs[0])
    assert err1 < 0.05 * err0


# ---------------------------------------------------------------- Sim(3)

def _sim3_circle(n, n_loops, rng):
    """Ground-truth Sim(3) nodes on a circle + exact edge measurements."""
    from cuda_surf_tpu.slam.sim3graph import Sim3Graph, _compose, _inverse
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    Rs, ts, ss = [], [], []
    for k in range(n):
        c, s = np.cos(th[k]), np.sin(th[k])
        Rs.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]))
        ts.append(np.array([5 * c, 5 * s, 0.1 * k / n]))
        ss.append(1.0)
    Rs, ts, ss = np.stack(Rs), np.stack(ts), np.array(ss)
    ei = list(range(n - 1)) + list(rng.integers(0, n // 2, n_loops))
    ej = list(range(1, n)) + [i + n // 2 for i in ei[n - 1:]]
    rel = [
        _compose(ss[j], Rs[j], ts[j], *_inverse(ss[i], Rs[i], ts[i]))
        for i, j in zip(ei, ej)
    ]
    g = Sim3Graph(
        s=jnp.asarray(ss, jnp.float32),
        R=jnp.asarray(Rs, jnp.float32), t=jnp.asarray(ts, jnp.float32),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        rel_s=jnp.asarray([r[0] for r in rel], jnp.float32),
        rel_R=jnp.asarray(np.stack([r[1] for r in rel]), jnp.float32),
        rel_t=jnp.asarray(np.stack([r[2] for r in rel]), jnp.float32),
        weight=jnp.ones((len(ei), 3), jnp.float32))
    return g, Rs, ts, ss


def test_sim3_converges_from_perturbation(rng):
    from cuda_surf_tpu.slam import sim3graph
    g, Rs, ts, ss = _sim3_circle(14, 3, rng)
    # perturb all but node 0 (the gauge)
    pert_s = np.ones(14); pert_s[1:] = np.exp(rng.normal(0, 0.2, 13))
    dR = np.asarray(exp_so3(jnp.asarray(
        np.concatenate([np.zeros((1, 3)), rng.normal(0, 0.05, (13, 3))]),
        jnp.float32)))
    dt = np.concatenate([np.zeros((1, 3)), rng.normal(0, 0.3, (13, 3))])
    gp = g._replace(s=jnp.asarray(ss * pert_s, jnp.float32),
                    R=jnp.asarray(np.einsum("nij,njk->nik", dR, Rs),
                                  jnp.float32),
                    t=jnp.asarray(ts + dt, jnp.float32))
    go, costs = jax.jit(lambda g: sim3graph.optimize(g, n_iters=10))(gp)
    assert float(costs[-1]) < 1e-6 * max(float(costs[0]), 1e-12)
    np.testing.assert_allclose(np.asarray(go.s), ss, atol=2e-3)
    np.testing.assert_allclose(np.asarray(go.t), ts, atol=2e-2)


def test_sim3_corrects_scale_drift(rng):
    """Monocular scale drift: initial scales decay gamma^k along the
    chain; a single loop edge carrying the true relative scale must
    pull every node back (the SE(3) graph cannot absorb this)."""
    from cuda_surf_tpu.slam import sim3graph
    n = 20
    g, Rs, ts, ss = _sim3_circle(n, 1, np.random.default_rng(5))
    gamma = 0.97
    drift = gamma ** np.arange(n)
    gp = g._replace(s=jnp.asarray(ss * drift, jnp.float32))
    go, costs = jax.jit(lambda g: sim3graph.optimize(g, n_iters=12))(gp)
    assert float(costs[-1]) < 1e-6
    np.testing.assert_allclose(np.asarray(go.s), ss, atol=5e-3)
    cen = sim3graph.centres(go)
    cen_true = -np.einsum("nij,ni->nj", Rs.transpose(0, 2, 1), ts)
    np.testing.assert_allclose(cen, cen_true, atol=2e-2)


def test_sim3_dense_cg_agree(rng):
    from cuda_surf_tpu.slam import sim3graph
    g, Rs, ts, ss = _sim3_circle(12, 2, rng)
    gp = g._replace(s=g.s * jnp.asarray(
        np.exp(np.random.default_rng(2).normal(0, 0.1, 12)), jnp.float32))
    gd, _ = jax.jit(lambda g: sim3graph.optimize(g, n_iters=6,
                                                 solver="dense"))(gp)
    gc, _ = jax.jit(lambda g: sim3graph.optimize(g, n_iters=6,
                                                 solver="cg"))(gp)
    np.testing.assert_allclose(np.asarray(gd.t), np.asarray(gc.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd.s), np.asarray(gc.s), atol=1e-4)


def test_distributed_matches_single_device():
    """Edge-sharded distributed pose graph (one psum per CG matvec)
    must match the single-device CG solver on an 8-device mesh.
    Local deterministic rng: the shared fixture's stream depends on
    test selection order, and this parity tolerance is tight."""
    from jax.sharding import Mesh
    from cuda_surf_tpu.slam.posegraph import optimize_distributed

    g, Rs, ts = _circle_graph(40, 6, np.random.default_rng(11))
    mesh = Mesh(np.asarray(jax.devices()), ("edges",))
    gd, cd = optimize_distributed(g, mesh, n_iters=6)
    gs, cs = jax.jit(lambda g: optimize(g, n_iters=6, solver="cg"))(g)
    np.testing.assert_allclose(np.asarray(gd.t), np.asarray(gs.t),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(cd), np.asarray(cs),
                               rtol=1e-3, atol=1e-7)
    # recovers the circle
    assert float(jnp.abs(gd.t - ts).max()) < 1e-2


def test_distributed_robust_matches_single():
    """Distributed Huber-IRLS path is numerically the single-device
    robust CG (same per-edge reweighting, edges merely sharded)."""
    from jax.sharding import Mesh
    from cuda_surf_tpu.slam.posegraph import optimize_distributed

    g, Rs, ts = _circle_graph(30, 4, np.random.default_rng(12))
    E = int(g.edge_i.shape[0])
    rel_t = np.asarray(g.rel_t).copy()
    rel_t[E - 1] += np.array([0.4, -0.3, 0.2], np.float32)  # moderate
    g = g._replace(rel_t=jnp.asarray(rel_t))
    is_loop = jnp.arange(E) >= 29
    mesh = Mesh(np.asarray(jax.devices()), ("edges",))
    gd, _ = optimize_distributed(g, mesh, n_iters=8, robust_delta=0.1,
                                 robust_mask=is_loop)
    gs, _ = jax.jit(lambda g: optimize(
        g, n_iters=8, solver="cg", robust_delta=0.1,
        robust_mask=is_loop))(g)
    np.testing.assert_allclose(np.asarray(gd.t), np.asarray(gs.t),
                               atol=1e-3)


def test_gross_outlier_loop_rejected():
    """A grossly wrong loop edge must be CUT, not merely downweighted:
    Huber bounds its influence, but with one gauge anchor a bounded
    force still bends a long chain by O(length x delta) — the
    a-posteriori chi-square rejection in optimize_with_loops removes it
    and re-optimizes (two-stage robust recipe)."""
    from types import SimpleNamespace
    from cuda_surf_tpu.slam.loopclosure import (LoopClosure,
                                                optimize_with_loops)

    rng = np.random.default_rng(4)
    g, Rs, ts = _circle_graph(30, 0, rng, drift=0.01)
    frames = [SimpleNamespace(R=np.asarray(g.R[k], np.float64),
                              t=np.asarray(g.t[k], np.float64))
              for k in range(30)]
    # one GOOD loop (true relative pose 3 -> 18, detector convention
    # T_j = T_rel T_i; on this circle the camera-frame rel translation
    # is ~0, so its unit direction is arbitrary) ...
    def rel(i, j):
        Rr = Rs[j] @ Rs[i].T
        return Rr, ts[j] - Rr @ ts[i]
    Rg, tg = rel(3, 18)
    tg = tg if np.linalg.norm(tg) > 1e-9 else np.array([1.0, 0, 0])
    good = LoopClosure(i=3, j=18, R=Rg, t=tg / np.linalg.norm(tg),
                       n_inliers=100, med_depth=40.0)
    # ... and one gross outlier: its triangulated-depth scale claims
    # the endpoints are ~50 units apart (true separation ~0.075) —
    # exactly the failure a bogus-but-RANSAC-consistent closure causes
    Rb, _ = rel(5, 20)
    bad_dir = np.array([0.8, 0.0, 0.6])
    bad = LoopClosure(i=5, j=20, R=Rb, t=bad_dir / np.linalg.norm(bad_dir),
                      n_inliers=100, med_depth=0.1)
    fd = [5.0] * 30   # scale(bad) = fd_i / med_depth = 50
    Ro, to, cost = optimize_with_loops(
        frames, [good, bad], n_iters=10, max_rot=10.0, max_trans=1e9,
        frame_depths=fd)
    err = np.abs(to - ts).max()
    # without rejection the bounded Huber influence still bends the
    # chain; with the chi-square cut the planted edge is gone
    Ro2, to2, _ = optimize_with_loops(
        frames, [good, bad], n_iters=10, max_rot=10.0, max_trans=1e9,
        frame_depths=fd, reject_residual=None)
    err2 = np.abs(to2 - ts).max()
    assert err < 0.2, (err, err2)
    assert err2 > err + 0.1, (err, err2)
