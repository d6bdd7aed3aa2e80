"""Span-bucketed per-keypoint patch kernels (and the disabled
step-decimated experiment): the fallback path for keypoints whose
sample footprint exceeds the shared-tile supertiles of
:mod:`.patch_wavelets` (grids mode for every span, descriptor mode for
span > the supertile caps).  See patch_wavelets for the derivation and
PERF.md for the step-decimation negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .patch_common import (_ABLATE, _bin_descriptor, _col_weights,
                           _dot_limbs, _image_limbs, _limbs_for,
                           _RESIDENT_BYTES, _round_up, _row_weights)


def bucket_specs(h_pad: int, w_pad: int, max_span: int,
                 resident: bool = False):
    """Static per-bucket patch shapes.

    Returns a list of (span_limit, E_r, E_c): keypoints whose sample
    footprint half-extent ("span" = irad*step + s + 1) is <= span_limit
    get an (E_r, E_c) integral-image patch.  Row extents double per
    bucket; once the patch covers the whole (padded) image every span
    fits.  Column extents are E_r + 128: the span limit is row-bound
    (E_r/2 - 6 < E_c/2 - 66 already at E_c = E_r + 128), so wider
    patches only added DMA traffic.  Once E_r covers the image height
    the bucket snaps to the full padded image — its patch origin is
    then constant, so the kernel can keep ONE resident copy instead of
    a multi-MB DMA per keypoint.

    `resident` (whole-image limb planes VMEM-resident, see `_kernel`):
    the patch is a dynamic slice of int8 planes whose sublane tile is
    32, so row origins align down to 32 instead of 8 — the guaranteed
    row margin shrinks to E_r/2 - 16.
    """
    specs = []
    e = 128
    rmargin = 17 if resident else 6
    while True:
        er = min(e, h_pad)
        if er >= h_pad:
            ec = w_pad
        else:
            ec = min(e + 128, w_pad)
        # The patch must hold rows/cols [i - span, i + span + 1] around
        # the keypoint: origins are pre-biased then aligned down to the
        # tile boundary, leaving the keypoint within half a tile of
        # centre, so each margin is at least E/2 - tile/2 - 2.
        lim_r = 10 ** 9 if er >= h_pad else er // 2 - rmargin
        lim_c = 10 ** 9 if ec >= w_pad else ec // 2 - 66
        lim = min(lim_r, lim_c)
        specs.append((lim, er, ec))
        if lim >= max_span:
            break
        e *= 2
    return specs


# Whole-image int8 limb planes are kept VMEM-resident (instead of
# per-keypoint patch DMAs) when they fit this budget; the rest of the
# 16 MB VMEM holds the stage-B accumulator, weights and output block.
def _kernel(count_ref, meta_ref, fpar_ref, ii_ref, out_ref, patch,
            acc, sem, *, R, E_r, E_c, E_rp, E_cp, RC, CC, CH, NB, NBUF,
            RH, mode, cfg_s, bound, shared, resident):
    """One grid step processes up to CH keypoints.

    meta is (8, cap) int32 — rows [r0, c0, iyl, ixl, step, s, irad, _];
    fpar is (8, cap) float32 — rows [fracr, fracc, spacing, sine, cose]
    (descriptor mode only); both transposed so the SMEM minor dim is the
    128-aligned capacity.  Output block: mode "grids" (CH, 2*RH, 128)
    with dy at [0:R2, 0:R2] and dx at [RH:RH+R2, 0:R2]; mode "desc"
    (CH, 128) descriptor rows.

    Stage A contracts the RAW integral-image patch: the dy/dx stencils
    are zero-sum along both axes, so any per-row / per-column additive
    offset cancels exactly through the two selection matmuls — no
    anchoring pass is needed.  Limb counts are sized by `_limbs_for`
    against the static value bounds: max|ii| <= bound for stage A, and
    the row-combined operand <= 2*bound for stage B.

    The patch is streamed in NB row bands of RC rows so even whole-image
    buckets (doubled mode) stay within VMEM: each band contributes its
    row-combination partial A_band = Rw_band @ p_band into the `acc`
    scratch (the (2*RH, E_cp) row-combined matrix), and the column
    combinations run once from `acc` after the last band.  Band DMAs are
    double-buffered against compute across keypoints and bands.

    `shared` marks the whole-image bucket (constant patch origin): the
    image is copied into VMEM ONCE at grid step 0 and every keypoint
    reads the resident copy — no per-keypoint DMA at all.

    `resident` goes further: ii_ref holds the image's PRE-DECOMPOSED
    int8 limb planes (m1, h_pad, w_pad), copied into VMEM once at grid
    step 0; every keypoint's stage A is a direct int8 matmul against a
    dynamic (E_r, E_c) slice of the resident planes — no per-keypoint
    DMA and no per-keypoint limb extraction.  Slice row origins are
    32-aligned (the int8 sublane tile).
    """
    gid = pl.program_id(0)
    count = count_ref[0]
    base = gid * CH
    RW = 2 * RH
    # meta row 7: per-keypoint frame row base (nonzero only when the
    # caller stacked B frames vertically in one integral image) —
    # subtracted from iy for the frame-local border checks in binning

    m1_limbs = _limbs_for(bound)
    m2_limbs = _limbs_for(2 * bound)

    if resident or shared:
        @pl.when(gid == 0)
        def _():
            cp = pltpu.make_async_copy(
                ii_ref,
                patch if resident
                else patch.at[0, pl.ds(0, E_r), pl.ds(0, E_c)],
                sem.at[0])
            cp.start()
            cp.wait()
    else:
        def dma(k, b, slot):
            rows = min(RC, E_r - b * RC)  # b static; last band is partial
            r0 = pl.multiple_of(meta_ref[0, k], 8) + b * RC
            c0 = pl.multiple_of(meta_ref[1, k], 128)
            return pltpu.make_async_copy(
                ii_ref.at[pl.ds(r0, rows), pl.ds(c0, E_c)],
                patch.at[slot, pl.ds(0, rows), pl.ds(0, E_c)],
                sem.at[slot])

        @pl.when((gid == 0) & (count > 0))
        def _():
            dma(0, 0, 0).start()

    n_here = jnp.clip(count - base, 0, CH)

    def body(j, carry):
        k = base + j
        q0 = k * NB
        iscalars = (meta_ref[2, k], meta_ref[3, k], meta_ref[4, k],
                    meta_ref[5, k], meta_ref[6, k])

        if resident:
            # stage A straight off the resident limb planes: one int8
            # matmul per limb against the keypoint's (E_r, E_c) window
            r0 = pl.multiple_of(meta_ref[0, k], 32)
            c0 = pl.multiple_of(meta_ref[1, k], 128)
            Rw = _row_weights(0, iscalars, R=R, RH=RH, RC=E_r,
                              masked=mode == "grids").astype(jnp.int8)
            for li in range(m1_limbs):
                sl = patch[li, pl.ds(r0, E_r), pl.ds(c0, E_c)]
                dd = lax.dot_general(Rw, sl, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                if li == 0:
                    acc[:, 0:E_c] = dd
                else:
                    acc[:, 0:E_c] = acc[:, 0:E_c] + (dd << (8 * li))
            if E_cp > E_c:
                # stage B reads E_cp-wide chunks: zero the padding tail
                # so out-of-image sample lanes stay 0 as documented
                acc[:, E_c:E_cp] = jnp.zeros((RW, E_cp - E_c), jnp.int32)
        else:
            for b in range(NB):
                if shared:
                    # band = rows [b*RC, (b+1)*RC) of the resident copy
                    band = patch[0, b * RC:(b + 1) * RC]
                else:
                    slot = lax.rem(q0 + b, NBUF)
                    nxt = lax.rem(q0 + b + 1, NBUF)
                    if b < NB - 1:
                        dma(k, b + 1, nxt).start()
                    else:
                        # last band: prefetch the next keypoint's first
                        # band
                        @pl.when(k + 1 < count)
                        def _():
                            dma(k + 1, 0, nxt).start()
                    dma(k, b, slot).wait()
                    band = patch[slot]
                Rw = _row_weights(b * RC, iscalars, R=R, RH=RH, RC=RC,
                                  masked=mode == "grids")
                for ci in range(E_cp // CC):
                    cc = ci * CC
                    pc = band[:, cc:cc + CC]
                    contrib = _dot_limbs(pc, Rw, m1_limbs, left=True)
                    if b == 0:
                        acc[:, cc:cc + CC] = contrib
                    else:
                        acc[:, cc:cc + CC] = acc[:, cc:cc + CC] + contrib

        if _ABLATE == "nostageb" and mode == "desc":
            out_ref[j] = acc[0, 0:128].astype(jnp.float32)
            return carry

        G = jnp.zeros((RW, 128), jnp.int32)
        for ci in range(E_cp // CC):
            cc = ci * CC
            cdy, cdx = _col_weights(cc, iscalars, R=R, CC=CC,
                                    masked=mode == "grids")
            A = acc[:, cc:cc + CC]
            g_dy = _dot_limbs(A[:RH], cdy, m2_limbs)
            g_dx = _dot_limbs(A[RH:], cdx, m2_limbs)
            G = G + jnp.concatenate([g_dy, g_dx], axis=0)
        dyv = G[:RH].astype(jnp.float32)
        dxv = G[RH:].astype(jnp.float32)

        if mode == "desc" and _ABLATE == "nobin":
            out_ref[j] = dyv[0] + dxv[0]
            return carry

        if mode == "grids":
            out_ref[j] = jnp.concatenate([dyv, dxv], axis=0)
        else:
            iyl, ixl = meta_ref[2, k], meta_ref[3, k]
            gscalars = (meta_ref[0, k] + iyl - meta_ref[7, k],
                        meta_ref[1, k] + ixl,
                        meta_ref[4, k], meta_ref[5, k], meta_ref[6, k])
            fscalars = (fpar_ref[0, k], fpar_ref[1, k], fpar_ref[2, k],
                        fpar_ref[3, k], fpar_ref[4, k])
            out_ref[j] = _bin_descriptor(
                dyv, dxv, gscalars, fscalars, R=R, RH=RH, cfg_s=cfg_s)
        return carry

    lax.fori_loop(0, n_here, body, 0)

    zero_row = (jnp.zeros((2 * RH, 128), jnp.float32) if mode == "grids"
                else jnp.zeros((128,), jnp.float32))

    def zero_body(j, carry):
        out_ref[j] = zero_row
        return carry

    lax.fori_loop(n_here, CH, zero_body, 0)


def _bucket_call(ii_pad, count, meta, fpar, *, R, E_r, E_c, cap,
                 interpret, mode, cfg_s, shared=False, limbs8=None,
                 value_bound=None):
    resident = limbs8 is not None
    R2 = 2 * R + 1
    RH = _round_up(R2, 8)
    if resident:
        m1, h_pad, w_pad = limbs8.shape
    else:
        h_pad, w_pad = ii_pad.shape
    # max |ii| value: the whole padded image by default, or the caller's
    # per-frame bound when frames are stacked vertically (each frame's
    # integral restarts, so stacking does not grow the value range)
    bound = value_bound if value_bound is not None else 255 * h_pad * w_pad
    if resident:
        assert m1 == _limbs_for(bound)
        NBUF = 1
    if shared:
        assert E_r == h_pad and E_c == w_pad
        NBUF = 1
    RC = E_r if resident else min(E_r, 256)
    # one column chunk when it fits (E_c is always a 128-multiple);
    # chunking only exists to bound the doubled-mode whole-image case
    CC = E_c if E_c <= 1536 else 512
    E_rp, E_cp = _round_up(E_r, RC), _round_up(E_c, CC)
    NB = E_rp // RC
    CH = 32 if E_r * E_c <= 512 * 512 else 8
    cap = _round_up(cap, CH)
    band_bytes = RC * E_cp * 4
    if not (shared or resident):
        NBUF = 4 if 4 * band_bytes <= 6 * 1024 * 1024 else 2
    kernel = functools.partial(
        _kernel, R=R, E_r=E_r, E_c=E_c, E_rp=E_rp, E_cp=E_cp,
        RC=RC, CC=CC, CH=CH, NB=NB, NBUF=NBUF, RH=RH, mode=mode,
        cfg_s=cfg_s, bound=bound, shared=shared, resident=resident)
    if mode == "grids":
        out_block, out_shape = (CH, 2 * RH, 128), (cap, 2 * RH, 128)
        out_spec = pl.BlockSpec(out_block, lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_block, out_shape = (CH, 128), (cap, 128)
        out_spec = pl.BlockSpec(out_block, lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    if resident:
        patch_scratch = pltpu.VMEM((m1, h_pad, w_pad), jnp.int8)
        patch_bytes = m1 * h_pad * w_pad
    elif shared:
        patch_scratch = pltpu.VMEM((1, E_rp, E_cp), jnp.int32)
        patch_bytes = E_rp * E_cp * 4
    else:
        patch_scratch = pltpu.VMEM((NBUF, RC, E_cp), jnp.int32)
        patch_bytes = NBUF * RC * E_cp * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap // CH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
        scratch_shapes=[
            patch_scratch,
            pltpu.VMEM((2 * RH, E_cp), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    vmem_limit = min(patch_bytes + 2 * RH * E_cp * 4
                     + 8 * 2 ** 20, 15 * 2 ** 20)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(count, meta, fpar, limbs8 if resident else ii_pad)


def _run_bucketed(ii, ix, iy, step, iscale, irad, valid, fparams, *,
                  R, max_span, mode, cfg_s=None, caps=None,
                  interpret=False, rad_bound_fn=None, span_lo=0,
                  min_span=0, resident=None, row_base=None,
                  value_bound=None):
    """Shared bucketing orchestration: sort keypoints by patch span,
    run one pallas_call per bucket, reassemble in original order.
    Returns (K, ...) rows (grids: (K, 2*RH, 128); desc: (K, 128)).

    `rad_bound_fn(span_lo, span_hi) -> int` (desc mode only): a static
    iradius bound for the keypoints routable to each bucket — shrinks
    the per-bucket sample-grid height (and every matmul M-dim) below
    the global `R` where the span range allows it.  Grids mode keeps
    the global R: its output rows are shaped by it.

    `min_span`: a static guarantee that every valid keypoint has
    span > min_span (the caller routed smaller spans elsewhere) —
    buckets whose limit falls below it are dropped instead of running
    empty pallas_calls.

    `resident` (None = auto by VMEM budget): keep the whole image's
    int8 limb planes VMEM-resident and slice per-keypoint windows from
    them — no per-keypoint patch DMA and no in-kernel limb extraction.
    Doubled-mode images exceed the budget and keep the streaming path.

    `row_base` (K,) int32: per-keypoint frame row offset when `ii`
    vertically stacks B frames (desc mode: border checks run on
    iy - row_base, i.e. frame-local coordinates).  `value_bound`: the
    per-frame max |ii| in that case (limb counts and the resident
    budget are sized by it instead of the stacked height).
    """
    assert rad_bound_fn is None or mode == "desc"
    K = ix.shape[0]
    R2 = 2 * R + 1
    RH = _round_up(R2, 8)
    h, w = ii.shape
    w_pad = _round_up(w, 128)
    h_pad32 = _round_up(h, 32)
    if value_bound is None:
        value_bound = 255 * h_pad32 * w_pad
    m1 = _limbs_for(value_bound)
    if resident is None:
        resident = m1 * h_pad32 * w_pad <= _RESIDENT_BYTES
    h_pad = h_pad32 if resident else _round_up(h, 8)
    ii_pad = jnp.pad(ii, ((0, h_pad - h), (0, w_pad - w)))
    limbs8 = _image_limbs(ii_pad, m1) if resident else None

    specs = bucket_specs(h_pad, w_pad, max_span, resident=resident)
    # drop buckets no valid keypoint can route to (span > min_span);
    # keep the last spec unconditionally (it accepts every span)
    specs = [s for s in specs[:-1] if s[0] > min_span] + [specs[-1]]
    nb = len(specs)
    rad_bounds = None
    if rad_bound_fn is not None:
        rad_bounds = [rad_bound_fn(span_lo, min(lim, max_span))
                      for (lim, _, _) in specs]
    if caps is None:
        caps = [max(K >> b, 128) for b in range(nb)]
    # caller-supplied caps index the FILTERED spec list (buckets whose
    # span limit falls at or below min_span are dropped above); truncate
    # or extend so caps[b] always refers to specs[b]
    caps = list(caps)[:nb]
    caps += [max(K >> b, 128) for b in range(len(caps), nb)]
    caps = [_round_up(min(c, _round_up(K, 16)), 16) for c in caps]
    max_cap = max(caps)

    span = irad * step + iscale + 1
    key = jnp.zeros((K,), jnp.int32)
    for lim, _, _ in specs[:-1]:
        key += (span > lim).astype(jnp.int32)
    key = jnp.where(valid, key, nb)

    # sort-free bucket placement: each keypoint's destination row is its
    # bucket's start plus its rank within the bucket (prefix sums), and
    # the per-bucket selections come from one scatter of the identity —
    # cheaper than argsort and exactly stable.  A bucket's patch covers
    # every smaller span, so keypoints beyond a bucket's static capacity
    # cascade into the next bucket instead of being silently dropped
    # (caps are soft limits; only exhausting ALL buckets drops).
    dest = jnp.zeros((K,), jnp.int32)
    unplaced = valid
    cnts_list = []
    start = jnp.int32(0)
    starts_list = []
    for b in range(nb):
        elig = unplaced & (key <= b)
        rank = jnp.cumsum(elig.astype(jnp.int32)) - 1
        take = elig & (rank < caps[b])
        dest = jnp.where(take, start + rank, dest)
        starts_list.append(start)
        cnt = jnp.sum(take).astype(jnp.int32)
        cnts_list.append(cnt)
        start = start + cnt
        unplaced &= ~take
    m = unplaced | ~valid
    dest = jnp.where(m, start + jnp.cumsum(m.astype(jnp.int32)) - 1, dest)
    cnts = jnp.stack(cnts_list)
    starts = jnp.stack(starts_list)
    sel_all = jnp.zeros((K + max_cap,), jnp.int32).at[dest].set(
        jnp.arange(K, dtype=jnp.int32))

    row_shape = (2 * RH, 128) if mode == "grids" else (128,)
    sorted_out = jnp.zeros((K + max_cap,) + row_shape, jnp.float32)

    for b, (lim, E_r, E_c) in enumerate(specs):
        cap = caps[b]
        R_b = R if rad_bounds is None else max(1, min(R, rad_bounds[b]))
        # constant-origin whole-image bucket -> keep ONE resident copy,
        # if it fits VMEM (doubled-mode images don't: those keep the
        # banded per-keypoint streaming)
        shared = (not resident and E_r >= h_pad and E_c >= w_pad
                  and E_r * E_c * 4 <= 8 * 2 ** 20)
        sel = lax.dynamic_slice(sel_all, (starts[b],), (cap,))
        byi = jnp.take(iy, sel)
        bxi = jnp.take(ix, sel)
        # Centre the patch on the keypoint with the tile-alignment bias
        # folded in BEFORE rounding down, so both margins keep at least
        # E/2 - tile/2 usable extent (see bucket_specs limits).  The
        # resident int8 planes have a (32, 128) tile: align rows to 32.
        ra = 32 if resident else 8
        r0 = (jnp.clip(byi - E_r // 2 + ra // 2, 0, h_pad - E_r)
              // ra) * ra
        c0 = (jnp.clip(bxi - E_c // 2 + 64, 0, w_pad - E_c) // 128) * 128
        meta = jnp.stack([
            r0, c0, byi - r0, bxi - c0,
            jnp.take(step, sel), jnp.take(iscale, sel),
            jnp.take(irad, sel),
            (jnp.take(row_base, sel) if row_base is not None
             else jnp.zeros((cap,), jnp.int32)),
        ], axis=0)
        fpar = jnp.take(fparams, sel, axis=1)
        count = jnp.minimum(cnts[b], cap).reshape(1)
        out = _bucket_call(ii_pad, count, meta, fpar, R=R_b, E_r=E_r,
                           E_c=E_c, cap=cap, interpret=interpret,
                           mode=mode, cfg_s=cfg_s, shared=shared,
                           limbs8=limbs8, value_bound=value_bound)
        sorted_out = lax.dynamic_update_slice(
            sorted_out, out[:cap], (starts[b],) + (0,) * len(row_shape))

    return jnp.take(sorted_out, dest, axis=0)


# --- step-decimated fallback (descriptors for large-step keypoints) -------
#
# The span-bucketed fallback's cost is stage-A dominated (ablation:
# 1.5 of 2.3 us/keypoint): its row-combination matmuls contract the
# keypoint's full (E_r, E_c) patch although the dy/dx stencils only
# touch 4 row-offset classes {br, br+1, br-s, br+s+1} of an arithmetic
# progression with stride `step`.  For a STATIC step SD, decimating the
# integral image rows into SD phase planes makes each offset class a
# CONTIGUOUS row range of one plane, so stage A collapses from m1 limb
# matmuls over E_r rows to six (RH_b, E_cw) dynamic slices and adds —
# no row matmul at all.  Stage B (column-selection matmuls, re-anchored
# to the keypoint's column window so three limbs stay exact) and the
# binning are unchanged.  One kernel per step value in DEC_STEPS;
# leftover steps keep the bucketed path.
#
# MEASURED AND DISABLED (hardware, left.pgm, round 4): the per-keypoint
# stage-A work does collapse, but five per-step pallas calls each pay a
# resident-plane DMA + XLA decimation transpose + launch (~0.15-0.2 ms
# fixed), so the composition LOSES to the span-bucketed fallback it
# replaces: dec (599 kps) 1.26 ms + step>=9 tail (181 kps) 1.09 ms =
# 2.34 ms vs 1.77 ms for the plain fallback on the same 780 keypoints.
# Worth revisiting only with a single multi-step kernel (planes for all
# steps exceed VMEM; would need per-keypoint HBM window DMAs).
# descriptor_rows routes through it only when DEC_STEPS is non-empty.

DEC_STEPS = ()


def _kernel_sdec(count_ref, meta_ref, fpar_ref, planes_hbm, out_ref,
                 planes, stk, sem, *, SD, P0, R_b, RH_b, E_cw, CH, HQ,
                 m1, m2, cfg_s):
    """Grid step = CH keypoints against the VMEM-resident decimated
    planes ((SD*HQ, Wp) int32; image row r lives at plane row
    ((r+P0) % SD) * HQ + (r+P0)//SD).  meta rows: [iy, ix, s, irad, c0].

    The four stencil row classes {0, +1, -s, s+1} are each a CONTIGUOUS
    row range of one plane, but their starts are not 8-aligned (Mosaic
    requires provable sublane alignment), so each class loads an
    8-ALIGNED (RH8, E_cw) window into the `stk` scratch and one small
    shift-combination matmul (RW_b, 4*RH8) @ (4*RH8, E_cw) — +/-1
    entries at the per-class shifted rows delta = q0 - align8(q0) —
    produces both dy and dx row-combined operands.  Its K-dim 4*RH8
    (~190) replaces the bucketed fallback's full patch height
    (256-992): stage A stops scaling with keypoint span.
    """
    gid = pl.program_id(0)
    count = count_ref[0]
    base = gid * CH
    RH8 = RH_b + 8
    RW_b = 2 * RH_b
    R2 = 2 * R_b + 1

    @pl.when(gid == 0)
    def _():
        cp = pltpu.make_async_copy(planes_hbm, planes, sem.at[0])
        cp.start()
        cp.wait()

    n_here = jnp.clip(count - base, 0, CH)

    def body(j, carry):
        k = base + j
        iy = meta_ref[0, k]
        ix = meta_ref[1, k]
        s = meta_ref[2, k]
        irad = meta_ref[3, k]
        c0 = pl.multiple_of(meta_ref[4, k], 128)

        deltas = []
        for ci_, o in enumerate((jnp.int32(0), jnp.int32(1), -s, s + 1)):
            t = iy + o + P0
            q0 = lax.rem(t, SD) * HQ + t // SD - R_b
            q8 = pl.multiple_of((q0 // 8) * 8, 8)
            stk[ci_ * RH8:(ci_ + 1) * RH8] = \
                planes[pl.ds(q8, RH8), pl.ds(c0, E_cw)]
            deltas.append(q0 - q8)

        # W[r, e]: dy rows r in [0, RH_b) combine classes (+0 +1 -2 -3),
        # dx rows r in [RH_b, RW_b) combine (+3 -2); class c contributes
        # at its shifted row g + delta_c of block c
        ri = lax.broadcasted_iota(jnp.int32, (RW_b, 4 * RH8), 0)
        e = lax.broadcasted_iota(jnp.int32, (RW_b, 4 * RH8), 1)
        ce = e // RH8
        re = e - ce * RH8
        is_dy = ri < RH_b
        g = jnp.where(is_dy, ri, ri - RH_b)
        d_c = jnp.where(ce == 0, deltas[0],
                        jnp.where(ce == 1, deltas[1],
                                  jnp.where(ce == 2, deltas[2],
                                            deltas[3])))
        sgn_dy = jnp.where(ce <= 1, 1, -1)
        sgn_dx = jnp.where(ce == 3, 1, jnp.where(ce == 2, -1, 0))
        match = (re == g + d_c) & (g < R2)
        W = jnp.where(match, jnp.where(is_dy, sgn_dy, sgn_dx), 0)

        A = _dot_limbs(stk[...], W, m1, left=True)
        # re-anchor: |row band sums| <= 255*(2s+1)*E_cw -> m2 limbs exact
        a_dy = A[:RH_b] - A[:RH_b, 0:1]
        a_dx = A[RH_b:] - A[RH_b:, 0:1]
        isc = (iy, ix - c0, jnp.int32(SD), s, irad)
        cdy, cdx = _col_weights(0, isc, R=R_b, CC=E_cw,
                                masked=False)
        dyv = _dot_limbs(a_dy, cdy, m2).astype(jnp.float32)
        dxv = _dot_limbs(a_dx, cdx, m2).astype(jnp.float32)
        gscalars = (iy, ix, jnp.int32(SD), s, irad)
        fscalars = (fpar_ref[0, k], fpar_ref[1, k], fpar_ref[2, k],
                    fpar_ref[3, k], fpar_ref[4, k])
        out_ref[j] = _bin_descriptor(
            dyv, dxv, gscalars, fscalars, R=R_b, RH=RH_b, cfg_s=cfg_s)
        return carry

    lax.fori_loop(0, n_here, body, 0)

    def zero_body(j, carry):
        out_ref[j] = jnp.zeros((128,), jnp.float32)
        return carry

    lax.fori_loop(n_here, CH, zero_body, 0)


def _run_step_dec(ii, ix, iy, step, iscale, irad, elig, fparams, *,
                  SD, R_b, s_max, cfg_s, cap=512, interpret=False):
    """Descriptor rows for `elig` keypoints of static step SD.

    Returns (rows (K, 128) — zero outside the placed set — and the
    boolean mask of keypoints actually placed; overflow beyond `cap`
    stays unplaced and must be routed to the bucketed fallback)."""
    K = ix.shape[0]
    h, w = ii.shape
    Wp = _round_up(w, 128)
    R2 = 2 * R_b + 1
    RH_b = _round_up(R2, 8)
    # top/bottom zero padding so every stencil row of every in-image
    # keypoint resolves to a valid plane row (out-of-image samples read
    # zeros and are masked by the binning's border checks); RH_b + 9
    # covers the R_b rows above the first sample, the RH_b - R_b padded
    # grid rows below the last, AND the aligned-load over-read of up to
    # 8 rows (the kernel reads (RH_b + 8)-row windows from 8-aligned
    # starts; HQ is an 8-multiple so those windows never cross a plane
    # boundary)
    PAD = RH_b + 9 + (s_max + SD - 1) // SD
    P0 = PAD * SD
    # column window: full margin, or the whole (padded) width for small
    # images — safe exactly because c0 = 0 then covers every in-image
    # column (an intermediate width would zero un-masked samples)
    E_cw = min(_round_up(2 * (R_b * SD + s_max + 1) + 132, 128), Wp)
    HQ = _round_up(-(-(h + 2 * P0) // SD), 8)
    ii_ext = jnp.zeros((HQ * SD, Wp), jnp.int32)
    ii_ext = lax.dynamic_update_slice(
        ii_ext, jnp.pad(ii, ((0, 0), (0, Wp - w))), (P0, 0))
    planes = ii_ext.reshape(HQ, SD, Wp).transpose(1, 0, 2).reshape(
        SD * HQ, Wp)

    CH = 16
    cap = _round_up(min(cap, _round_up(K, 16)), CH)
    rank = jnp.cumsum(elig.astype(jnp.int32)) - 1
    take = elig & (rank < cap)
    dest = jnp.where(take, rank, cap)
    sel = jnp.zeros((cap + 1,), jnp.int32).at[dest].set(
        jnp.arange(K, dtype=jnp.int32))[:cap]
    bix = jnp.take(ix, sel)
    c0 = (jnp.clip(bix - E_cw // 2 + 64, 0, Wp - E_cw) // 128) * 128
    meta = jnp.stack([jnp.take(iy, sel), bix, jnp.take(iscale, sel),
                      jnp.take(irad, sel), c0], axis=0)
    fpar = jnp.take(fparams, sel, axis=1)
    count = jnp.sum(take).astype(jnp.int32).reshape(1)

    m1 = _limbs_for(255 * h * Wp)
    m2 = _limbs_for(255 * (2 * s_max + 1) * E_cw)
    kernel = functools.partial(_kernel_sdec, SD=SD, P0=P0, R_b=R_b,
                               RH_b=RH_b, E_cw=E_cw, CH=CH, HQ=HQ,
                               m1=m1, m2=m2, cfg_s=cfg_s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap // CH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((CH, 128), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SD * HQ, Wp), jnp.int32),
            pltpu.VMEM((4 * (RH_b + 8), E_cw), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(SD * HQ * Wp * 4 + cap * 512
                                 + 6 * 2 ** 20, 15 * 2 ** 20)),
        interpret=interpret,
    )(count, meta, fpar, planes)
    out = jnp.concatenate([out, jnp.zeros((1, 128), jnp.float32)])
    rows = jnp.take(out, jnp.where(take, rank, cap), axis=0)
    return rows, take


