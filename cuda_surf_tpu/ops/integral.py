"""Integral image (TPU-native re-derivation of surfd.cu:129-318).

The reference builds the zero-padded int32 integral image with per-row /
per-column scan kernels (integralRow/integralCol) and a 6-launch unroll-4
blocked scan for the 2x-upsampled variant (cuIntegralDoubleU4,
surfd.cu:2707-2772).  On TPU the prefix sums are computed EXACTLY on the
MXU as matmuls against 0/1 triangular matrices: pixel values (<= 255)
are bf16-exact, so the row scan is one bf16 pass; its outputs (<= 2^19)
are split into 8-bit limbs for the column scan and recombined in int32
— ~10x faster than XLA's log-depth `cumsum` scans, and bit-exact.  The
same machinery produces stride-decimated "phase" integral planes for
the Hessian pyramid directly from the image (see `phase_integral`),
replacing TPU-hostile strided slicing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _scan_rows_tri(x_bf16, n_out: int, stride: int, phase: int):
    """Exact prefix sums of uint8-ranged rows: out[r, X] = sum of
    x[r, :stride*X + phase] via one bf16 matmul (inputs <= 255 exact,
    outputs <= 255*W < 2^24 exact in the f32 accumulator)."""
    w = x_bf16.shape[1]
    col = lax.broadcasted_iota(jnp.int32, (w, n_out), 0)
    out = lax.broadcasted_iota(jnp.int32, (w, n_out), 1)
    U = (col < stride * out + phase).astype(jnp.bfloat16)
    return lax.dot_general(x_bf16, U, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _scan_cols_tri_limbs(y_f32, n_out: int, stride: int, phase: int):
    """Exact int32 column prefix sums of f32 integer rows (values <
    2^24): out[Y, c] = sum of y[:stride*Y + phase, c], via 8-bit limb
    matmuls recombined in int32."""
    h = y_f32.shape[0]
    yi = y_f32.astype(jnp.int32)
    out = lax.broadcasted_iota(jnp.int32, (n_out, h), 0)
    row = lax.broadcasted_iota(jnp.int32, (n_out, h), 1)
    L = (row < stride * out + phase).astype(jnp.bfloat16)
    acc = None
    for li in range(3):
        p = yi >> (8 * li)
        part = (p if li == 2 else (p & 255)).astype(jnp.bfloat16)
        d = lax.dot_general(L, part, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        di = d.astype(jnp.int32) << (8 * li)
        acc = di if acc is None else acc + di
    return acc


def phase_integral(img: jnp.ndarray, d: int, p: int, q: int) -> jnp.ndarray:
    """Stride-decimated integral plane ii[p::d, q::d] computed directly
    from the uint8 image with triangular MXU matmuls (ii zero-padded:
    ii[r, c] = sum(img[:r, :c])).  Exact int32."""
    h, w = img.shape
    hp = (h + 1 - 1 - p) // d + 1
    wq = (w + 1 - 1 - q) // d + 1
    rows = _scan_rows_tri(img.astype(jnp.bfloat16), wq, d, q)  # (h, wq)
    return _scan_cols_tri_limbs(rows, hp, d, p)                # (hp, wq)


def phase_planes_all(img: jnp.ndarray, d: int) -> dict:
    """ALL d*d stride-d integral phase planes in two MXU matmuls.

    Per-phase scans issue O(d^2) tiny matmuls per octave (~10-30 us of
    fixed cost each — the hessian pyramid's dominant cost at d=8/16);
    instead the q phases are concatenated into one triangular row pass,
    then every (p, limb) is folded into a single stacked column pass.
    Uniform block sizes (hp, wq) = (h//d+1, w//d+1) leave harmless
    validly-cumulative tails.  Exact int32 (limb recombination as in
    _scan_cols_tri_limbs).  Returns {(p, q): (hp, wq) int32 plane}.
    """
    h, w = img.shape
    hp = h // d + 1
    wq = w // d + 1
    W = d * wq
    # row pass: out column j = (q, X) -> sum of img[r, : d*X + q]
    col = lax.broadcasted_iota(jnp.int32, (w, W), 0)
    j = lax.broadcasted_iota(jnp.int32, (w, W), 1)
    U = (col < d * (j % wq) + j // wq).astype(jnp.bfloat16)
    rows = lax.dot_general(img.astype(jnp.bfloat16), U,
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # (h, W)
    yi = rows.astype(jnp.int32)                                 # < 2^24
    parts = jnp.concatenate([yi & 255, (yi >> 8) & 255, yi >> 16],
                            axis=1).astype(jnp.bfloat16)        # (h, 3W)
    # column pass: out row i = (p, Y) -> sum over img rows < d*Y + p
    i = lax.broadcasted_iota(jnp.int32, (d * hp, h), 0)
    row = lax.broadcasted_iota(jnp.int32, (d * hp, h), 1)
    L = (row < d * (i % hp) + i // hp).astype(jnp.bfloat16)
    out = lax.dot_general(L, parts, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)   # (d*hp, 3W)
    acc = (out[:, :W].astype(jnp.int32)
           + (out[:, W:2 * W].astype(jnp.int32) << 8)
           + (out[:, 2 * W:].astype(jnp.int32) << 16))
    return {(p, q): lax.slice(acc, (p * hp, q * wq),
                              ((p + 1) * hp, (q + 1) * wq))
            for p in range(d) for q in range(d)}


def phase_planes_packed(img: jnp.ndarray, d: int, keys, hp: int,
                        wq: int) -> jnp.ndarray:
    """Selected stride-d integral phase planes as ONE tile-aligned
    (len(keys), hp, wq) int32 pack (consumed whole by the fused
    detection kernel, ops/fused_detect.py).

    Same two-matmul machinery as :func:`phase_planes_all`, but with the
    per-phase block sizes padded to the (8, 128) tile (hp multiple of
    8, wq multiple of 128) so the per-key slices are tile-aligned
    copies, and only the requested (row%d, col%d) classes are stacked.
    Rows/cols beyond the image are validly-cumulative tails (callers
    mask them).
    """
    h, w = img.shape
    assert hp % 8 == 0 and wq % 128 == 0
    W = d * wq
    col = lax.broadcasted_iota(jnp.int32, (w, W), 0)
    j = lax.broadcasted_iota(jnp.int32, (w, W), 1)
    U = (col < d * (j % wq) + j // wq).astype(jnp.bfloat16)
    rows = lax.dot_general(img.astype(jnp.bfloat16), U,
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)  # (h, W)
    yi = rows.astype(jnp.int32)                                 # < 2^24
    parts = jnp.concatenate([yi & 255, (yi >> 8) & 255, yi >> 16],
                            axis=1).astype(jnp.bfloat16)        # (h, 3W)
    i = lax.broadcasted_iota(jnp.int32, (d * hp, h), 0)
    row = lax.broadcasted_iota(jnp.int32, (d * hp, h), 1)
    L = (row < d * (i % hp) + i // hp).astype(jnp.bfloat16)
    out = lax.dot_general(L, parts, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)   # (d*hp, 3W)
    acc = (out[:, :W].astype(jnp.int32)
           + (out[:, W:2 * W].astype(jnp.int32) << 8)
           + (out[:, 2 * W:].astype(jnp.int32) << 16))
    return jnp.stack([lax.slice(acc, (p * hp, q * wq),
                                ((p + 1) * hp, (q + 1) * wq))
                      for (p, q) in keys])


def _integral_mxu(src_u8: jnp.ndarray) -> jnp.ndarray:
    h, w = src_u8.shape
    return phase_integral(src_u8, 1, 0, 0)


def integral_image(img: jnp.ndarray, doubled: bool = False) -> jnp.ndarray:
    """uint8 (H, W) -> int32 zero-padded integral image.

    I[y, x] = sum(img[:y, :x]); row 0 / col 0 are zero (the (+1,+1) write
    offset of integralRow, surfd.cu:135-138).  With `doubled`, the source
    is 2x bilinearly upsampled with round-half-even first
    (integralDoubleRow0U2 semantics, surfd.cu:186-205), output
    (2H-1+1 x 2W-1+1) - 1 => (2H-1, 2W-1) source grid.
    """
    src = img.astype(jnp.int32)
    if doubled:
        h, w = src.shape
        up = jnp.zeros((2 * h - 1, 2 * w - 1), jnp.int32)
        up = up.at[0::2, 0::2].set(src)
        up = up.at[0::2, 1::2].set(_rn((src[:, :-1] + src[:, 1:]) * jnp.float32(0.5)))
        up = up.at[1::2, 0::2].set(_rn((src[:-1, :] + src[1:, :]) * jnp.float32(0.5)))
        up = up.at[1::2, 1::2].set(_rn(
            (src[:-1, :-1] + src[:-1, 1:] + src[1:, :-1] + src[1:, 1:])
            * jnp.float32(0.25)))
        src = up
    if jax.default_backend() == "tpu":
        return _integral_mxu(src.astype(jnp.uint8))
    h, w = src.shape
    ii = jnp.cumsum(jnp.cumsum(src, axis=0, dtype=jnp.int32), axis=1,
                    dtype=jnp.int32)
    return jnp.zeros((h + 1, w + 1), jnp.int32).at[1:, 1:].set(ii)


def _rn(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.round(x).astype(jnp.int32)


def box_sum(ii: jnp.ndarray, x1, y1, x2, y2):
    """Inclusive rectangle sum over cols [x2..x1], rows [y2..y1]
    (getSum, surfd.cu:334-343).  Index args may be arrays (gather form)."""
    return ii[y1 + 1, x1 + 1] + ii[y2, x2] - ii[y2, x1 + 1] - ii[y1 + 1, x2]


def wavelet_dy(ii, x, y, size):
    """Haar wavelet dy response (getWavelet1, surfd.cu:1171-1175)."""
    return (box_sum(ii, x + size, y, x - size, y - size)
            - box_sum(ii, x + size, y + size, x - size, y))


def wavelet_dx(ii, x, y, size):
    """Haar wavelet dx response (getWavelet2, surfd.cu:1178-1182)."""
    return (box_sum(ii, x + size, y + size, x, y - size)
            - box_sum(ii, x, y + size, x - size, y - size))
