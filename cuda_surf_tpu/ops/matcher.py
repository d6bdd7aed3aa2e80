"""Brute-force descriptor matching on the MXU.

TPU-native re-derivation of findMaxCorr (surfd.cu:2535-2671).  The CUDA
kernel hand-tiles a 64-wide dot-product cross-matrix through skewed
shared memory with best/second-best tracking; on TPU that entire
structure is one `D1 @ D2.T` matmul (the MXU's native shape) followed by
`lax.top_k(2)`.  Semantics preserved: one-directional set1 -> set2
nearest neighbour, scores are cosine similarities of L2-normalized
descriptors, ambiguity = second_best / (best + 1e-6)
(surfd.cu:2665-2669); no ratio-test rejection is applied.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax
from jax import lax

from ..types import Keypoints, Matches


def match(desc1: jnp.ndarray, valid1: jnp.ndarray,
          desc2: jnp.ndarray, valid2: jnp.ndarray,
          x2: jnp.ndarray, y2: jnp.ndarray,
          scores: jnp.ndarray | None = None) -> Matches:
    neg = jnp.float32(-1e30)
    if scores is None:
        # HIGH = bf16x3 passes: ~1e-6 relative score error on unit-norm
        # descriptors, half the MXU passes of full-f32 emulation
        scores = jnp.dot(desc1, desc2.T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGH)
    scores = jnp.where(valid2[None, :], scores, neg)
    # Best/second-best via two masked max passes: top_k sorts whole rows,
    # which is orders of magnitude slower on TPU than these fused
    # reductions over the matmul output (the reference tracks exactly
    # max + second-max per point, surfd.cu:2610-2626).
    best = jnp.max(scores, axis=1)
    index = jnp.argmax(scores, axis=1).astype(jnp.int32)
    cols = lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    second = jnp.max(jnp.where(cols == index[:, None], neg, scores), axis=1)
    return Matches(
        score=best,
        index=index,
        match_x=x2[index],
        match_y=y2[index],
        ambiguity=jnp.where(second > neg,
                            second / (best + jnp.float32(1e-6)), 0.0),
        valid=valid1 & (best > neg),
    )


def match_keypoints(kp1: Keypoints, desc1: jnp.ndarray,
                    kp2: Keypoints, desc2: jnp.ndarray,
                    cross_check: bool = False) -> Matches:
    """One-directional set1 -> set2 matching (the reference semantics).

    With `cross_check`, matches that are not mutual nearest neighbours
    are marked invalid (the symmetric filter the reference leaves to
    its caller) — one extra masked-argmax over the same score matrix.

    On TPU the one-directional path runs the fused Pallas kernel
    (ops/matcher_pallas.py): the score matrix never leaves VMEM, vs
    several HBM round trips of the (N1, N2) f32 matrix here.  NOTE:
    do not vmap this on TPU — batch via lax.map (parallel.BatchSurf
    does).
    """
    from .matcher_pallas import fused_best2, use_fused_matcher
    if not cross_check and use_fused_matcher():
        neg = jnp.float32(-1e30)
        best, second, index = fused_best2(desc1, desc2, kp2.valid)
        return Matches(
            score=best,
            index=index,
            match_x=kp2.x[index],
            match_y=kp2.y[index],
            ambiguity=jnp.where(second > neg,
                                second / (best + jnp.float32(1e-6)), 0.0),
            valid=kp1.valid & (best > neg),
        )
    scores = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGH)
    m = match(desc1, kp1.valid, desc2, kp2.valid, kp2.x, kp2.y,
              scores=scores)
    if not cross_check:
        return m
    neg = jnp.float32(-1e30)
    # reuse the forward cross-matrix: the backward argmax only masks
    # along the other axis, no second MXU pass needed
    scores = jnp.where(kp1.valid[:, None], scores, neg)
    back = jnp.argmax(scores, axis=0).astype(jnp.int32)   # (N2,)
    mutual = back[m.index] == jnp.arange(m.index.shape[0], dtype=jnp.int32)
    return m._replace(valid=m.valid & mutual)
