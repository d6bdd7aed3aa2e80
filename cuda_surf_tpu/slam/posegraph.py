"""Pose-graph optimization (Gauss-Newton over SE(3) relative constraints).

New capability (BASELINE.json north star).  TPU-first: per-edge residual
Jacobians come from vmapped forward-mode autodiff, the normal equations
are scatter-added into a dense (6N, 6N) system (pose graphs are small),
and the solve is one replicated dense factorization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry.pose import exp_so3, log_so3, compose, invert
from ..utils.precision import f32_matmuls


class PoseGraph(NamedTuple):
    R: jnp.ndarray        # (N, 3, 3) world->cam (or cam->world, consistent)
    t: jnp.ndarray        # (N, 3)
    edge_i: jnp.ndarray   # (E,) int32
    edge_j: jnp.ndarray   # (E,) int32
    rel_R: jnp.ndarray    # (E, 3, 3) measured T_i^-1 T_j rotation
    rel_t: jnp.ndarray    # (E, 3)
    weight: jnp.ndarray   # (E,) f32


def _edge_residual(Ri, ti, Rj, tj, rel_R, rel_t, xi_i, xi_j):
    """Residual of one edge with local increments xi (6,) applied:
    r = log( rel^{-1} * (T_i ⊞ xi_i)^{-1} (T_j ⊞ xi_j) )."""
    Ri = exp_so3(xi_i[:3]) @ Ri
    ti = ti + xi_i[3:]
    Rj = exp_so3(xi_j[:3]) @ Rj
    tj = tj + xi_j[3:]
    Rinv, tinv = invert(Ri, ti)
    Rij, tij = compose(Rinv, tinv, Rj, tj)
    Rrel_inv, trel_inv = invert(rel_R, rel_t)
    Re, te = compose(Rrel_inv, trel_inv, Rij, tij)
    return jnp.concatenate([log_so3(Re), te])


@f32_matmuls
def optimize(graph: PoseGraph, n_iters: int = 10,
             damping: float = 1e-6) -> PoseGraph:
    n = graph.R.shape[0]
    zero6 = jnp.zeros(6, jnp.float32)

    def residual_and_jac(Ri, ti, Rj, tj, rel_R, rel_t):
        f = lambda xi, xj: _edge_residual(Ri, ti, Rj, tj, rel_R, rel_t, xi, xj)
        r = f(zero6, zero6)
        Ji = jax.jacfwd(f, argnums=0)(zero6, zero6)
        Jj = jax.jacfwd(f, argnums=1)(zero6, zero6)
        return r, Ji, Jj

    batched = jax.vmap(residual_and_jac)

    ii, jj = graph.edge_i, graph.edge_j
    # one-hot selects/accumulations instead of row gathers and
    # scatter-adds (TPU scatter runs ~10x slower than the matmul)
    oh_i = jax.nn.one_hot(ii, n, dtype=jnp.float32)      # (E, n)
    oh_j = jax.nn.one_hot(jj, n, dtype=jnp.float32)
    oh_hh = jax.nn.one_hot(jnp.concatenate([ii * n + ii, jj * n + jj,
                                            ii * n + jj, jj * n + ii]),
                           n * n, dtype=jnp.float32)     # (4E, n^2)
    oh_bb = jnp.concatenate([oh_i, oh_j], axis=0)        # (2E, n)

    def sel(oh, a):
        return (oh @ a.reshape(n, -1)).reshape(oh.shape[0], *a.shape[1:])

    def step(carry, _):
        R, t = carry
        r, Ji, Jj = batched(sel(oh_i, R), oh_i @ t,
                            sel(oh_j, R), oh_j @ t,
                            graph.rel_R, graph.rel_t)
        w = graph.weight[:, None, None]
        blocks = jnp.concatenate([
            w * jnp.einsum("eai,eaj->eij", Ji, Ji),
            w * jnp.einsum("eai,eaj->eij", Jj, Jj),
            w * jnp.einsum("eai,eaj->eij", Ji, Jj),
            w * jnp.einsum("eai,eaj->eij", Jj, Ji)], axis=0)
        H = jnp.einsum("ec,ez->cz", oh_hh,
                       blocks.reshape(-1, 36)).reshape(n, n, 6, 6)
        wb = graph.weight[:, None]
        bvecs = jnp.concatenate([
            -wb * jnp.einsum("eai,ea->ei", Ji, r),
            -wb * jnp.einsum("eai,ea->ei", Jj, r)], axis=0)
        b = oh_bb.T @ bvecs
        Hm = H.transpose(0, 2, 1, 3).reshape(6 * n, 6 * n)
        Hm = Hm + damping * jnp.eye(6 * n)
        # gauge: clamp node 0
        gauge = jnp.arange(6 * n) < 6
        Hm = jnp.where(gauge[:, None] | gauge[None, :], 0.0, Hm)
        Hm = Hm + jnp.diag(jnp.where(gauge, 1.0, 0.0))
        bv = b.reshape(-1) * (~gauge)
        dx = jnp.linalg.solve(Hm, bv).reshape(n, 6)
        R = exp_so3(dx[:, :3]) @ R
        t = t + dx[:, 3:]
        return (R, t), jnp.sum(r * r)

    (R, t), costs = lax.scan(step, (graph.R, graph.t), None, length=n_iters)
    return graph._replace(R=R, t=t), costs
