"""Fused brute-force matcher kernel: cross-matrix matmul + best/second
tracking in one VMEM pass.

The XLA formulation (ops/matcher.py) materializes the (N1, N2) f32
score matrix through HBM several times (matmul output + masked
max/argmax passes: ~67 MB each way at 4096x4096) — ~1.1 ms of the
measured match cost.  Here the matrix never leaves VMEM: the grid
covers N1 in row blocks; each step keeps the (padded) descriptor set 2
resident, computes (N1B, N2T) score tiles with the same bf16x3
product as jax.lax.Precision.HIGH, and folds them into running
best/second/index vectors — the reference's per-thread max tracking
(findMaxCorr, surfd.cu:2610-2626) re-expressed as a streaming tile
reduction.

Tie rules are identical to ops/matcher.match (first-index argmax ties,
second-best excludes only the argmax column, invalid set-2 columns
masked to -1e30), but scores agree only up to bf16x3 accumulation
order (~1e-5), so the argmax index/valid bits can differ from the XLA
path on near-equal scores — do not rely on bitwise equality between
the two matchers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


import numpy as _np
_NEG = _np.float32(-1e30)  # np scalar: a jnp constant would be a captured tracer in the kernel


def _kernel(d1_ref, d2t_ref, v2_ref, out_ref, *, N2, N2T, D):
    """One grid step = one N1 row block; stream set 2 in N2T-col tiles."""
    d1 = d1_ref[...]                      # (N1B, D) f32
    d1h = d1.astype(jnp.bfloat16)
    d1l = (d1 - d1h.astype(jnp.float32)).astype(jnp.bfloat16)
    n1b = d1.shape[0]

    best = jnp.full((n1b, 1), _NEG, jnp.float32)
    second = jnp.full((n1b, 1), _NEG, jnp.float32)
    idx = jnp.zeros((n1b, 1), jnp.int32)

    def dot(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    for jt in range(N2 // N2T):
        d2t = d2t_ref[:, jt * N2T:(jt + 1) * N2T]      # (D, N2T) f32
        d2h = d2t.astype(jnp.bfloat16)
        d2l = (d2t - d2h.astype(jnp.float32)).astype(jnp.bfloat16)
        # Precision.HIGH: hi*hi + hi*lo + lo*hi
        s = dot(d1h, d2h) + (dot(d1h, d2l) + dot(d1l, d2h))
        s = jnp.where(v2_ref[:1, jt * N2T:(jt + 1) * N2T] > 0, s, _NEG)
        cols = lax.broadcasted_iota(jnp.int32, s.shape, 1) + jt * N2T
        m1 = jnp.max(s, axis=1, keepdims=True)
        # first-index argmax (jnp.argmax tie rule), gather-free
        i1 = jnp.min(jnp.where(s == m1, cols, jnp.int32(2 ** 30)),
                     axis=1, keepdims=True)
        m2 = jnp.max(jnp.where(cols == i1, _NEG, s), axis=1, keepdims=True)
        # merge tile top-2 into running top-2 (strict >: earlier tile
        # wins ties, preserving first-index semantics)
        take = m1 > best
        second = jnp.where(take, jnp.maximum(best, m2),
                           jnp.maximum(second, m1))
        idx = jnp.where(take, i1, idx)
        best = jnp.where(take, m1, best)

    # rows of the (1, 8, N1B) out block: 0 = best, 1 = second,
    # 2 = index bitcast to f32 (single block keeps the out spec tiled
    # (8, N1B) per Mosaic's last-two-dims divisibility rule)
    out_ref[0, 0] = best[:, 0]
    out_ref[0, 1] = second[:, 0]
    out_ref[0, 2] = lax.bitcast_convert_type(idx[:, 0], jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_best2(desc1, desc2, valid2, interpret=False):
    """-> (best, second, index), each (N1,), matching ops/matcher.match's
    masked max/second-max semantics over desc1 @ desc2.T."""
    N1, D = desc1.shape
    N2 = desc2.shape[0]
    Dp = _round_up(D, 128)
    N1B = 512 if N1 >= 512 else _round_up(N1, 8)
    N1p = _round_up(N1, N1B)
    N2T = 1024 if N2 >= 1024 else _round_up(N2, 128)
    N2p = _round_up(N2, N2T)

    d1 = jnp.zeros((N1p, Dp), jnp.float32).at[:N1, :D].set(desc1)
    d2t = jnp.zeros((Dp, N2p), jnp.float32).at[:D, :N2].set(desc2.T)
    v2 = jnp.zeros((8, N2p), jnp.float32).at[0, :N2].set(
        valid2.astype(jnp.float32))

    kernel = functools.partial(_kernel, N2=N2p, N2T=N2T, D=Dp)
    out = pl.pallas_call(
        kernel,
        grid=(N1p // N1B,),
        in_specs=[
            pl.BlockSpec((N1B, Dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, N2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, N2p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, N1B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N1p // N1B, 8, N1B),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (N1B * Dp + Dp * N2p + 8 * N2p) * 4
                + N1B * N2T * 4 * 4 + 4 * 2 ** 20, 15 * 2 ** 20)),
        interpret=interpret,
    )(d1, d2t, v2)
    best = out[:, 0].reshape(-1)[:N1]
    second = out[:, 1].reshape(-1)[:N1]
    idx = lax.bitcast_convert_type(out[:, 2], jnp.int32).reshape(-1)[:N1]
    return best, second, idx


def use_fused_matcher() -> bool:
    return jax.default_backend() == "tpu"
