"""Batched Haar-wavelet sampling (and descriptor binning) as Pallas TPU
kernels.

This is the TPU-native equivalent of the per-sample texture fetches in the
reference's descriptor / orientation kernels (describeURWithoutNormalization
surfd.cu:1566-1615, describeApproxWithoutNormalization surfd.cu:2391-2444,
assignOrientationApprox surfd.cu:1711-1960): every keypoint samples Haar
responses dx, dy on a (2R+1)x(2R+1) grid with per-keypoint spacing `step`
and wavelet half-size `s` from the integral image.

A literal translation (per-sample gathers) runs at ~150M elements/s on TPU
— hundreds of ms per frame.  Instead this kernel exploits two structural
facts:

1.  The sample grid is *separable*: all samples of one keypoint live on
    rows {iy + i*step} x cols {ix + j*step}, and each Haar response is a
    fixed stencil over row offsets {-s, 0, +1, s+1} and column offsets
    {-s, 0, +1, s+1}.  Algebraically (getSum/getWavelet, surfd.cu:334-350,
    1171-1196, with box(x1,y1,x2,y2) = ii[y1+1,x1+1]+ii[y2,x2]-ii[y2,x1+1]
    -ii[y1+1,x2]):

        dy(x,y,s) = D(y+1) + D(y) - D(y-s) - D(y+s+1),
                      where D(r) = ii[r, x+s+1] - ii[r, x-s]
        dx(x,y,s) = F(x+s+1) + F(x-s) - F(x) - F(x+1),
                      where F(c) = ii[y+s+1, c] - ii[y-s, c]

    so the full sample grid is (row-combination matrix) @ patch @
    (column-combination matrix): MXU matmuls against +/-1 selection
    matrices built from iota comparisons — no gathers at all.

2.  The matmuls are *exact*: the integer operand is decomposed into
    balanced base-256 digits (each in [-128, 127]) and contracted with
    the +/-1 selection matrices on the MXU's native int8 path with
    int32 accumulation, then recombined by shifts — unconditionally
    exact and twice the bf16 issue rate.  Subtracting the patch's first
    row and column (whose contributions cancel through the zero-sum
    stencils) bounds the values so the common bucket needs only three
    digits.

Two kernel modes:

- "grids": emit the raw dy/dx sample grids (used by orientation
  assignment, whose histogram runs in XLA).
- "desc": additionally run the full SURF descriptor binning in-kernel
  (sample geometry, Gaussian weights, bilinear 4x4x(4|8) binning as MXU
  contractions for the upright path) and emit one 128-lane descriptor
  row per keypoint — 384x less HBM output traffic than the grids.

Module layout (round 5): this file holds the SHARED-TILE kernels — the
resident-planes supertile (`_run_supertile_res`: whole-image int8 limb
planes copied to VMEM once, one 64px-margin level covering span<=63,
no per-tile DMA) used for single frames that fit the VMEM budget, and
the DMA-tile supertile (`_run_supertile`) used for frame-stacked /
oversized images — plus the public wavelet_grids / descriptor_rows
routing.  The span-bucketed per-keypoint fallback kernels live in
:mod:`.patch_bucketed`; the weight builders, limb machinery and
in-kernel binning they share live in :mod:`.patch_common`.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .patch_bucketed import (DEC_STEPS, _run_bucketed, _run_step_dec,
                             bucket_specs)
from .patch_common import (_ABLATE, _bin_descriptor, _col_weights,
                           _col_weights_cat, _dot_limbs, _emit_group_kp,
                           _image_limbs, _limbs_for, _RESIDENT_BYTES,
                           _round_up, _row_weights)


def use_pallas(cfg) -> bool:
    """Resolve cfg.wavelet_method: Pallas on TPU hardware (or when forced),
    the XLA gather path elsewhere."""
    m = cfg.wavelet_method
    if m == "auto":
        return jax.default_backend() == "tpu"
    return m in ("pallas", "interpret")


# --- shared-tile descriptor path ------------------------------------------
#
# Per-keypoint patch DMAs dominate the describe stage: ~1-2us of DMA
# latency per keypoint that double-buffering only partly hides.  Most
# keypoints (all of octave 0/1 in the default config) have small sample
# footprints, so instead of one patch per keypoint the image is covered
# by a static grid of (TE_R, TE_C) tiles with 64-pixel margins; one tile
# DMA serves every keypoint whose footprint fits a (128, 256) window of
# the resident tile (a dynamic, tile-aligned VMEM slice).  Keypoints
# whose span exceeds _TILE_SPAN_CAP fall back to the span-bucketed
# per-keypoint kernel above.

# Tile levels; keypoints route to the smallest level whose caps
# cover them, the rest to the bucketed fallback.  A level's row margin
# MR covers spans <= MR-1 (stage A contracts full tile rows); its
# column-window half-offset (WC-128)//2 covers the same span; the
# wavelet half-size cap keeps the stage-B band-sum bound
# |A[c]-A[cs]| <= 2*255*s*WC under the exact 3-limb budget
# (127 * 2^16 = 8.32M).
# Level 0 (120, 256): sized for the small-step bulk — octave-0
# keypoints are step 1-2 with span <= 39 (step 2: irad <= 17, s <= 4;
# step 1: irad <= 22, s <= 2 -> span <= 25) — 255*120*256 = 7.83M
# stays under the 3-limb stage-A capacity (8.356M; 128 rows would
# exceed it by 129) and each stacked stage-A matmul is (G*RW, 120) @
# (120, 256), ~5x fewer MACs per limb and one less limb than level 1.
# Level 1 (256, 512) takes the remaining span <= 63.
# A LARGER level 2 ((512, 1024, 512, 128, 127, 31), absorbing
# octave-1/2 keypoints) measured net-negative in round 2: its
# full-tile stage-A contractions cost as much per keypoint as the
# bucketed fallback it displaced, plus one more path of fixed overhead.
#          TE_R  TE_C    WC   MR  span_cap  s_cap
# (an A/B with a fatter level 0 — (256, 256), 60 tiles instead of 230 —
# measured WORSE: 1.53 vs 1.43 ms for the same 1264 keypoints, so
# per-grid-step overhead is not the supertile's floor)
_LEVELS = ((120, 256,   256,  40,   39,      38),
           (256, 512,   256,  64,   63,      62))

_TILE_GROUP = 8         # keypoints per stacked stage-A matmul


def _kernel_tiles(cnt_ref, start_ref, meta_ref, fpar_ref, ii_ref, out_ref,
                  patch, rel_limb, rw, acc, sem, *, R, RH, T, TX, h_pad,
                  w_pad, cfg_s, TE_R, TE_C, WC, TI_R, TI_C, rel_bound):
    """Grid step = one tile: DMA the tile once (double-buffered across
    steps), extract the tile's anchored-rel int8 limbs once, then
    process the tile's keypoints in groups of G: each group's
    row-combination matrices are stacked into one (G*2RH, TE_R) int8
    block and contracted against the tile limbs in a single MXU pass
    per limb — breaking the per-keypoint dependent-matmul chains of the
    bucketed kernel.  The per-keypoint column combination + binning run
    from a dynamic (2RH, 256) window of the group accumulator.  The out
    block is a single (K_pad, 128) VMEM buffer shared by all steps.

    meta rows: [_, cs, iyl_t, ixl_t, step, s, irad, _] with iyl_t/ixl_t
    tile-local and cs the 128-aligned column-window start."""
    t = pl.program_id(0)
    RW = 2 * RH
    G = _TILE_GROUP

    def origin(tt):
        ty = tt // TX
        tx = lax.rem(tt, TX)
        r0 = jnp.clip(ty * TI_R, 0, h_pad - TE_R)
        c0 = jnp.clip(tx * TI_C, 0, w_pad - TE_C)
        return pl.multiple_of(r0, 8), pl.multiple_of(c0, 128)

    def dma(tt, slot):
        r0, c0 = origin(tt)
        return pltpu.make_async_copy(
            ii_ref.at[pl.ds(r0, TE_R), pl.ds(c0, TE_C)],
            patch.at[slot], sem.at[slot])

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        dma(t + 1, lax.rem(t + 1, 2)).start()
    slot = lax.rem(t, 2)
    dma(t, slot).wait()

    r0_t, c0_t = origin(t)
    n_t = cnt_ref[t]
    s_t = start_ref[t]

    # tile-anchored rel bounded by `rel_bound` (the tile area for a
    # single image; cross-frame tiles of a stacked image are bounded by
    # per-frame horizontal differences instead, see _run_supertile) ->
    # m1 limbs; the stage-B operand is re-anchored to the keypoint's
    # column window, where the stencil rows collapse to <= (2s+1)-row
    # band sums: for every keypoint whose stencil stays inside its own
    # frame |A[c]-A[cs]| <= 2*255*s*WC, kept under the exact 3-limb
    # budget (top balanced digit <= 127) by the level's s_cap routing;
    # stencils crossing a frame boundary only feed sample lanes the
    # binning masks out (frame-local border checks).
    m1 = _limbs_for(rel_bound)
    m2 = 3

    @pl.when(n_t > 0)
    def _():
        p = patch[slot]
        rel = (p - p[:, 0:1]) - (p[0:1, :] - p[0:1, 0:1])
        tt = rel
        for li in range(m1):
            if li == m1 - 1:
                d = tt
            else:
                d = ((tt & 255) ^ 128) - 128
                tt = (tt - d) >> 8
            rel_limb[li] = d.astype(jnp.int8)

    def iscal(k):
        return (meta_ref[2, k], meta_ref[3, k], meta_ref[4, k],
                meta_ref[5, k], meta_ref[6, k])

    def group_body(gi, carry):
        g0 = s_t + gi * G
        n_in = jnp.minimum(n_t - gi * G, G)

        def build(j, c):
            # row weights target tile rows directly (iyl_t): stencil
            # rows outside the tile get zero weight, and their samples
            # are masked by the binning's image-border conditions
            rw[pl.ds(j * RW, RW)] = _row_weights(
                0, iscal(g0 + j), R=R, RH=RH, RC=TE_R,
                masked=False).astype(jnp.int8)
            return c

        lax.fori_loop(0, n_in, build, 0)

        w = rw[...]
        for li in range(m1):
            dd = lax.dot_general(w, rel_limb[li], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
            if li == 0:
                acc[...] = dd
            else:
                acc[...] = acc[...] + (dd << (8 * li))

        # NOTE: a fully static-unrolled emit (all G keypoints' chains in
        # one basic block, masked stores) was measured NEUTRAL on
        # hardware (supertile 2.48 -> 2.37 ms, full describe unchanged)
        # at several minutes of extra Mosaic compile time — the
        # per-keypoint chain cost is not fori_loop serialization.
        def emit(j, c):
            _emit_group_kp(meta_ref, fpar_ref, acc, out_ref, j, g0 + j,
                           r0_t, c0_t, R=R, RH=RH, WC=WC, m2=m2,
                           cfg_s=cfg_s)
            return c

        lax.fori_loop(0, n_in, emit, 0)
        return carry

    lax.fori_loop(0, (n_t + G - 1) // G, group_body, 0)


def _run_supertile(ii, ix, iy, step, iscale, irad, elig, fparams, *,
                   R, cfg_s, level=0, interpret=False, row_base=None,
                   frame_rows=None):
    """Shared-tile descriptor rows for `elig` keypoints (others zero).

    `row_base`/`frame_rows`: per-keypoint frame row offsets and the
    per-frame integral height when `ii` stacks B frames vertically —
    binning border checks run frame-locally, and the stage-A limb bound
    accounts for tiles straddling a frame boundary (tile-anchored rel of
    such a tile is bounded by two per-frame horizontal differences,
    2*255*frame_rows*TE_C, instead of the tile area)."""
    TE_R, TE_C, WC, MR, _, _ = _LEVELS[level]
    MC = (WC - 128) // 2
    TI_R, TI_C = TE_R - 2 * MR, TE_C - 2 * MC
    K = ix.shape[0]
    RH = _round_up(2 * R + 1, 8)
    h, w = ii.shape
    h_pad = max(_round_up(h, 8), TE_R)
    w_pad = max(_round_up(w, 128), TE_C)
    ii_pad = jnp.pad(ii, ((0, h_pad - h), (0, w_pad - w)))
    TY = max(1, -(-(h_pad - 2 * MR) // TI_R))
    TX = max(1, -(-(w_pad - 2 * MC) // TI_C))
    T = TY * TX

    ty = jnp.clip((iy - MR) // TI_R, 0, TY - 1)
    tx = jnp.clip((ix - MC) // TI_C, 0, TX - 1)
    tid = ty * TX + tx

    # stable per-tile placement via ONE 2-D prefix sum over the (K, T)
    # tile one-hot (a per-tile loop of 1-D cumsums costs ~T scan
    # kernels — ~2 ms of fixed overhead at T=28)
    onehot = ((tid[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :])
              & elig[:, None]).astype(jnp.int32)
    C = jnp.cumsum(onehot, axis=0)                      # (K, T)
    cnts = C[-1]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(cnts)[:-1]])
    # row-rank and tile-start selected by the one-hot itself (keeps the
    # hot path gather-free; a take_along_axis here cost ~40 ms/frame)
    rank = jnp.sum(onehot * C, axis=1) - 1
    start_k = jnp.sum(onehot * starts[None, :], axis=1)
    total = jnp.sum(cnts)
    m = ~elig
    dest = jnp.where(elig, start_k + rank,
                     total + jnp.cumsum(m.astype(jnp.int32)) - 1)
    sel = jnp.zeros((K,), jnp.int32).at[dest].set(
        jnp.arange(K, dtype=jnp.int32))

    # tile-local window geometry (same centering/alignment math as the
    # bucketed path, relative to the owning tile)
    r0 = jnp.clip(ty * TI_R, 0, h_pad - TE_R)
    c0 = jnp.clip(tx * TI_C, 0, w_pad - TE_C)
    iyl_t = iy - r0
    ixl_t = ix - c0
    cs = (jnp.clip(ixl_t - MC, 0, TE_C - WC) // 128) * 128
    meta = jnp.stack([jnp.zeros((K,), jnp.int32), cs, iyl_t, ixl_t,
                      step, iscale, irad,
                      (row_base if row_base is not None
                       else jnp.zeros((K,), jnp.int32))], axis=0)
    meta = jnp.take(meta, sel, axis=1)
    fpar = jnp.take(fparams, sel, axis=1)

    K_pad = _round_up(K, 8)
    RW = 2 * RH
    G = _TILE_GROUP
    rel_bound = 255 * TE_R * TE_C
    if frame_rows is not None:
        rel_bound = max(rel_bound, 2 * 255 * frame_rows * TE_C)
    m1 = _limbs_for(rel_bound)
    kernel = functools.partial(_kernel_tiles, R=R, RH=RH, T=T, TX=TX,
                               h_pad=h_pad, w_pad=w_pad, cfg_s=cfg_s,
                               TE_R=TE_R, TE_C=TE_C, WC=WC, TI_R=TI_R,
                               TI_C=TI_C, rel_bound=rel_bound)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((K_pad, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TE_R, TE_C), jnp.int32),       # tile patches
            pltpu.VMEM((m1, TE_R, TE_C), jnp.int8),       # rel limbs
            pltpu.VMEM((G * RW, TE_R), jnp.int8),         # stacked Rw
            pltpu.VMEM((G * RW, TE_C), jnp.int32),        # group A
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min((2 + 1) * TE_R * TE_C * 4
                                 + G * RW * (TE_R + 4 * TE_C)
                                 + K_pad * 512 + 8 * 2 ** 20,
                                 15 * 2 ** 20)),
        interpret=interpret,
    )(cnts, starts, meta, fpar, ii_pad)
    return jnp.take(out, dest, axis=0)


# --- resident-planes supertile (single-frame fast path) -------------------
#
# For a single frame whose int8 limb planes fit VMEM (1280x960 needs
# 4 x 1.2 MB), the tile machinery above simplifies radically: the
# whole image's balanced base-256 digit planes are XLA-precomputed
# ONCE, copied into VMEM at grid step 0, and every tile's stage A
# contracts the stacked group row weights directly against a dynamic
# (TE_R, TE_C) window of the resident planes — no per-tile DMA, no
# in-kernel rel anchoring or limb extraction (any per-row/per-column
# additive offset cancels through the zero-sum stencils, so the
# UN-anchored image limbs are contracted as-is; m1 is sized by the
# whole-image value bound, typically 4 limbs vs the tile path's 3).
# Freed from the tile-anchored 3-limb stage-A budget, ONE level with
# 64-pixel margins covers span <= 63 — the union of the two DMA-path
# levels — so the whole supertile population runs in a single
# pallas_call with a single routing prologue.
#
#            TE_R  TE_C   WC   MR/MC  span_cap  s_cap
_RES_TILE = (256,  256,   256, 64,    63,       62)


def _kernel_tiles_res(cnt_ref, start_ref, meta_ref, fpar_ref, limbs_hbm,
                      out_ref, planes, rw, acc, sem, *, R, RH, T, TX,
                      h_pad, w_pad, cfg_s, TE_R, TE_C, WC, TI_R, TI_C,
                      m1, ablate=None):
    """Grid step = one tile window of the VMEM-resident limb planes."""
    t = pl.program_id(0)
    RW = 2 * RH
    G = _TILE_GROUP

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        cp = pltpu.make_async_copy(limbs_hbm, planes, sem.at[0])
        cp.start()
        cp.wait()

    ty = t // TX
    tx = lax.rem(t, TX)
    r0_t = pl.multiple_of(jnp.minimum(ty * TI_R, h_pad - TE_R), 32)
    c0_t = pl.multiple_of(jnp.minimum(tx * TI_C, w_pad - TE_C), 128)
    n_t = cnt_ref[t]
    s_t = start_ref[t]

    def iscal(k):
        return (meta_ref[2, k], meta_ref[3, k], meta_ref[4, k],
                meta_ref[5, k], meta_ref[6, k])

    def group_body(gi, carry):
        g0 = s_t + gi * G
        n_in = jnp.minimum(n_t - gi * G, G)

        def build(j, c):
            rw[pl.ds(j * RW, RW)] = _row_weights(
                0, iscal(g0 + j), R=R, RH=RH, RC=TE_R,
                masked=False).astype(jnp.int8)
            return c

        if (ablate or _ABLATE) != "norw":  # probe: skip the rw build
            lax.fori_loop(0, n_in, build, 0)

        w = rw[...]
        nlimb = 1 if (ablate or _ABLATE) == "stagea1" else m1
        for li in range(nlimb):   # "stagea1": timing probe, 1 limb only
            sl = planes[li, pl.ds(r0_t, TE_R), pl.ds(c0_t, TE_C)]
            dd = lax.dot_general(w, sl, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
            if li == 0:
                acc[...] = dd
            else:
                acc[...] = acc[...] + (dd << (8 * li))

        def emit(j, c):
            _emit_group_kp(meta_ref, fpar_ref, acc, out_ref, j, g0 + j,
                           r0_t, c0_t, R=R, RH=RH, WC=WC, m2=3,
                           cfg_s=cfg_s, ablate=ablate)
            return c

        lax.fori_loop(0, n_in, emit, 0)
        return carry

    lax.fori_loop(0, (n_t + G - 1) // G, group_body, 0)


def _run_supertile_res(ii, ix, iy, step, iscale, irad, elig, fparams, *,
                       R, cfg_s, interpret=False, ablate=None):
    """Descriptor rows for `elig` keypoints via the resident-planes
    single-level supertile (others zero).  Caller guarantees the limb
    planes fit the VMEM budget (see descriptor_rows)."""
    TE_R, TE_C, WC, MR, _, _ = _RES_TILE
    MC = MR
    TI_R, TI_C = TE_R - 2 * MR, TE_C - 2 * MC
    K = ix.shape[0]
    RH = _round_up(2 * R + 1, 8)
    h, w = ii.shape
    h_pad = max(_round_up(h, 32), TE_R)
    w_pad = max(_round_up(w, 128), TE_C)
    ii_pad = jnp.pad(ii, ((0, h_pad - h), (0, w_pad - w)))
    m1 = _limbs_for(255 * h * w)
    limbs8 = _image_limbs(ii_pad, m1)
    TY = max(1, -(-(h_pad - 2 * MR) // TI_R))
    TX = max(1, -(-(w_pad - 2 * MC) // TI_C))
    T = TY * TX

    ty = jnp.clip((iy - MR) // TI_R, 0, TY - 1)
    tx = jnp.clip((ix - MC) // TI_C, 0, TX - 1)
    tid = ty * TX + tx

    onehot = ((tid[:, None] == jnp.arange(T, dtype=jnp.int32)[None, :])
              & elig[:, None]).astype(jnp.int32)
    C = jnp.cumsum(onehot, axis=0)                      # (K, T)
    cnts = C[-1]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(cnts)[:-1]])
    rank = jnp.sum(onehot * C, axis=1) - 1
    start_k = jnp.sum(onehot * starts[None, :], axis=1)
    total = jnp.sum(cnts)
    m = ~elig
    dest = jnp.where(elig, start_k + rank,
                     total + jnp.cumsum(m.astype(jnp.int32)) - 1)
    sel = jnp.zeros((K,), jnp.int32).at[dest].set(
        jnp.arange(K, dtype=jnp.int32))

    r0 = jnp.minimum(ty * TI_R, h_pad - TE_R)
    c0 = jnp.minimum(tx * TI_C, w_pad - TE_C)
    iyl_t = iy - r0
    ixl_t = ix - c0
    meta = jnp.stack([jnp.zeros((K,), jnp.int32),
                      jnp.zeros((K,), jnp.int32),    # cs = 0: WC == TE_C
                      iyl_t, ixl_t, step, iscale, irad,
                      jnp.zeros((K,), jnp.int32)], axis=0)
    meta = jnp.take(meta, sel, axis=1)
    fpar = jnp.take(fparams, sel, axis=1)

    K_pad = _round_up(K, 8)
    RW = 2 * RH
    G = _TILE_GROUP
    kernel = functools.partial(_kernel_tiles_res, R=R, RH=RH, T=T, TX=TX,
                               h_pad=h_pad, w_pad=w_pad, cfg_s=cfg_s,
                               TE_R=TE_R, TE_C=TE_C, WC=WC, TI_R=TI_R,
                               TI_C=TI_C, m1=m1, ablate=ablate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((K_pad, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m1, h_pad, w_pad), jnp.int8),     # limb planes
            pltpu.VMEM((G * RW, TE_R), jnp.int8),         # stacked Rw
            pltpu.VMEM((G * RW, TE_C), jnp.int32),        # group A
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(m1 * h_pad * w_pad
                                 + G * RW * (TE_R + 4 * TE_C)
                                 + K_pad * 512 + 6 * 2 ** 20,
                                 15 * 2 ** 20)),
        interpret=interpret,
    )(cnts, starts, meta, fpar, limbs8)
    return jnp.take(out, dest, axis=0)


def wavelet_grids(ii, ix, iy, step, iscale, irad, valid, *, R, max_span,
                  caps=None, interpret=False, resident=None):
    """Haar dy/dx on each keypoint's (2R+1)^2 sample grid.

    ii: (H, W) int32 zero-padded integral image.  Per-keypoint int32
    arrays (K,): sample-grid centre (ix, iy), sample spacing `step`,
    wavelet half-size `iscale`, sample radius `irad` (samples with
    |offset| > irad, or falling outside the image, are returned as 0 and
    must be masked by the caller exactly like the reference's border
    checks).  Returns (dy, dx), each (K, 2R+1, 2R+1) float32 holding raw
    integer wavelet values (callers apply the 1/255 scale and weights).
    """
    K = ix.shape[0]
    R2 = 2 * R + 1
    RH = _round_up(R2, 8)
    fparams = jnp.zeros((8, K), jnp.float32)
    G = _run_bucketed(ii, ix, iy, step, iscale, irad, valid, fparams,
                      R=R, max_span=max_span, mode="grids", caps=caps,
                      interpret=interpret, resident=resident)
    return G[:, :R2, :R2], G[:, RH:RH + R2, :R2]


def descriptor_rows(ii, ix, iy, step, iscale, irad, valid, fparams, *,
                    R, max_span, cfg_s, caps=None, interpret=False,
                    rad_bound_fn=None, row_base=None, frame_rows=None,
                    slab=None, nframes=None, dec_bounds=None):
    """Full in-kernel SURF descriptors: (K, 128) unnormalized rows
    (features in lanes [0, wsz*wsz*osz)).  fparams is (8, K) float32
    rows [fracr, fracc, spacing, sine, cose]; cfg_s is the static
    tuple (wsz, osz, upright, extended, ih, iw).

    Keypoints route to the smallest shared-tile level whose span/s caps
    cover them (level 0 takes all of octave 0, level 1 octaves 1-2 in
    the default config; one tile DMA serves ~100 keypoints); the rest
    go through the span-bucketed per-keypoint kernel.  The paths return
    rows on complementary masks.

    `rad_bound_fn(span_lo, span_hi) -> int` (optional, from
    SurfConfig.desc_iradius_bound): a static iradius bound per span
    range, used to size each fallback bucket's sample grid below the
    global R (large-span keypoints have step >= 4 and iradius well
    under the step-1 worst case).

    `row_base` (K,) / `frame_rows`: frame-stacked mode — see
    _run_supertile / _run_bucketed."""
    span = irad * step + iscale + 1
    remaining = valid
    rows = None
    covered = 0
    h_im, w_im = ii.shape
    use_res = (row_base is None
               and (_limbs_for(255 * h_im * w_im)
                    * max(_round_up(h_im, 32), _RES_TILE[0])
                    * max(_round_up(w_im, 128), _RES_TILE[1])
                    <= _RESIDENT_BYTES))
    if use_res:
        span_cap, s_cap = _RES_TILE[4], _RES_TILE[5]
        elig = remaining & (span <= span_cap) & (iscale <= s_cap)
        rows = _run_supertile_res(ii, ix, iy, step, iscale, irad, elig,
                                  fparams, R=R, cfg_s=cfg_s,
                                  interpret=interpret)
        remaining = remaining & ~elig
        covered = span_cap
    else:
        for lv, (_, _, _, _, span_cap, s_cap) in enumerate(_LEVELS):
            elig = remaining & (span <= span_cap) & (iscale <= s_cap)
            r = _run_supertile(ii, ix, iy, step, iscale, irad, elig,
                               fparams, R=R, cfg_s=cfg_s, level=lv,
                               interpret=interpret, row_base=row_base,
                               frame_rows=frame_rows)
            rows = r if rows is None else rows + r
            remaining = remaining & ~elig
            covered = span_cap
            if max_span <= span_cap:
                break
    if max_span > covered:
        # every keypoint the levels could not take has span > covered
        # (a level's s_cap cannot exclude span <= span_cap keypoints:
        # span >= s + 1 and s_cap >= span_cap - 1)
        span_lo = covered
        if dec_bounds and row_base is None:
            # step-decimated kernels for the common large-step values;
            # overflow/odd steps cascade to the bucketed fallback below
            for SD in DEC_STEPS:
                if SD not in dec_bounds:
                    continue
                R_b, s_max = dec_bounds[SD]
                elig_s = remaining & (step == SD)
                r, taken = _run_step_dec(
                    ii, ix, iy, step, iscale, irad, elig_s, fparams,
                    SD=SD, R_b=R_b, s_max=s_max, cfg_s=cfg_s,
                    interpret=interpret)
                rows = rows + r
                remaining = remaining & ~taken
        if row_base is None:
            rows = rows + _run_bucketed(
                ii, ix, iy, step, iscale, irad, remaining, fparams, R=R,
                max_span=max_span, mode="desc", cfg_s=cfg_s, caps=caps,
                interpret=interpret, rad_bound_fn=rad_bound_fn,
                span_lo=span_lo, min_span=span_lo)
        else:
            # frame-stacked mode: the fallback runs PER FRAME on that
            # frame's slab so its whole-image int8 limb planes stay
            # VMEM-resident (a stacked image would force the streaming
            # path's per-keypoint multi-MB patch DMAs back)
            K = ix.shape[0]
            fcaps = caps
            if fcaps is None and nframes > 1:
                kf = -(-K // nframes)
                fcaps = [max(kf >> b, 128) for b in range(8)]
            for f in range(nframes):
                elig_f = remaining & (row_base == f * slab)
                ii_f = lax.slice(ii, (f * slab, 0),
                                 ((f + 1) * slab, ii.shape[1]))
                rows = rows + _run_bucketed(
                    ii_f, ix, iy - f * slab, step, iscale, irad, elig_f,
                    fparams, R=R, max_span=max_span, mode="desc",
                    cfg_s=cfg_s, caps=fcaps, interpret=interpret,
                    rad_bound_fn=rad_bound_fn, span_lo=span_lo,
                    min_span=span_lo)
    return rows
