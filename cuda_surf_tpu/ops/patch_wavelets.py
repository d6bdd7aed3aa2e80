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

Keypoints are bucketed by patch extent (powers of two from 128), each
bucket running one pallas_call whose grid covers a static capacity in
chunks; a dynamic-trip-count inner loop skips unused capacity, and patch
DMAs are double-buffered against compute.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _limbs_for(bound: int) -> int:
    """Minimal number of balanced base-256 digits (each in [-128, 127])
    that exactly represents every integer in [-bound, bound].

    The m-limb balanced capacity is 127*(256^m-1)/255 ~ 2^(8m-1), NOT
    2^(8m)-1: a bit-length-derived limb count can under-provision by one
    limb near the boundary (the final digit would wrap 128 -> -128 in
    the int8 cast), so limb counts are sized against the true capacity.
    """
    m = 1
    while 127 * (256 ** m - 1) // 255 < bound:
        m += 1
    return m


def use_pallas(cfg) -> bool:
    """Resolve cfg.wavelet_method: Pallas on TPU hardware (or when forced),
    the XLA gather path elsewhere."""
    m = cfg.wavelet_method
    if m == "auto":
        return jax.default_backend() == "tpu"
    return m in ("pallas", "interpret")


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
_RESIDENT_BYTES = 10 * 2 ** 20


def _image_limbs(ii_pad: jnp.ndarray, m1: int) -> jnp.ndarray:
    """Balanced base-256 digit planes of the integral image, (m1, H, W)
    int8 — computed ONCE per frame in XLA so the bucket kernels contract
    them directly (the per-keypoint in-kernel decomposition of streamed
    int32 patches was ~1.4 us/keypoint of VPU work on the big buckets).
    """
    t = ii_pad
    limbs = []
    for li in range(m1):
        if li == m1 - 1:
            d = t
        else:
            d = ((t & 255) ^ 128) - 128
            t = (t - d) >> 8
        limbs.append(d.astype(jnp.int8))
    return jnp.stack(limbs)


def _dot_limbs(xi, w, limbs, left=False):
    """Exact int32 (xi:int32) @ (w:+/-1 int) — or w @ xi when `left`.

    xi is decomposed into balanced base-256 digits (each in
    [-128, 127], exact in int8) and contracted with the int8 MXU at
    native int32 accumulation — exact for any operand magnitude and
    2x the bf16 rate."""
    wb = w.astype(jnp.int8)
    acc = None
    t = xi
    for li in range(limbs):
        if li == limbs - 1:
            d = t        # remaining digit fits int8 by the bound
        else:
            d = ((t & 255) ^ 128) - 128
            t = (t - d) >> 8
        part = d.astype(jnp.int8)
        ab = (wb, part) if left else (part, wb)
        dd = lax.dot_general(ab[0], ab[1], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
        acc = dd if acc is None else acc + (dd << (8 * li))
    return acc


def _col_weights(cc, scalars, *, R, CC, masked=True):
    """(CC, 128) dy and dx column-combination weights for the static
    column chunk starting at cc.

    `masked=False` (descriptor mode) skips the out-of-radius /
    padding-column zeroing: those sample lanes carry garbage values but
    the binning's own ColW/ok masks multiply them by zero, so the
    weight build saves ~1/4 of its VPU ops.  Grids mode must keep the
    mask — its output contract returns 0 for masked samples."""
    iyl, ixl, step, s, irad = scalars
    R2 = 2 * R + 1
    ec = cc + lax.broadcasted_iota(jnp.int32, (CC, 128), 0)
    jc = lax.broadcasted_iota(jnp.int32, (CC, 128), 1)
    bc = ixl + (jc - R) * step

    def eqc(t):
        return (ec == t).astype(jnp.int32)

    c_dy = eqc(bc + s + 1) - eqc(bc - s)
    c_dx = eqc(bc + s + 1) + eqc(bc - s) - eqc(bc) - eqc(bc + 1)
    if not masked:
        return c_dy, c_dx
    ok_c = (jnp.abs(jc - R) <= irad) & (jc < R2)
    zero = jnp.int32(0)
    return (jnp.where(ok_c, c_dy, zero),
            jnp.where(ok_c, c_dx, zero))


def _col_weights_cat(scalars, *, R, WC, masked=False):
    """(WC, 256) merged [cdy | cdx] column weights (lanes [0, 128) dy,
    [128, 256) dx) for the single merged stage-B dot."""
    cdy, cdx = _col_weights(0, scalars, R=R, CC=WC, masked=masked)
    return jnp.concatenate([cdy, cdx], axis=1)


def _row_weights(cb, scalars, *, R, RH, RC, masked=True):
    """(2*RH, RC) row-combination weights for the static row band at cb:
    rows [0,R2) dy combos, rows [RH,RH+R2) dx combos.

    `masked=False`: see _col_weights — descriptor mode only."""
    iyl, ixl, step, s, irad = scalars
    R2 = 2 * R + 1
    RW = 2 * RH
    ri = lax.broadcasted_iota(jnp.int32, (RW, RC), 0)
    e = cb + lax.broadcasted_iota(jnp.int32, (RW, RC), 1)
    is_dy = ri < RH
    g = jnp.where(is_dy, ri, ri - RH)
    br = iyl + (g - R) * step

    def eq(t):
        return (e == t).astype(jnp.int32)

    w_dy = eq(br) + eq(br + 1) - eq(br - s) - eq(br + s + 1)
    w_dx = eq(br + s + 1) - eq(br - s)
    w = jnp.where(is_dy, w_dy, w_dx)
    if not masked:
        return w
    ok_r = (jnp.abs(g - R) <= irad) & (g < R2)
    return jnp.where(ok_r, w, 0)


def _bin_descriptor(dyv, dxv, iscalars, fscalars, *, R, RH, cfg_s):
    """In-kernel SURF descriptor binning (placeInIndex + addSample,
    surfd.cu:1199-1317): one (128,)-lane descriptor row from the dy/dx
    sample grids.  Bilinear bin weights and orientation channels are
    contracted on the MXU for the upright path; the rotated path uses
    per-(row,col)-bin masked reductions."""
    wsz, osz, upright, extended, ih, iw = cfg_s
    iy, ix, step, s, irad = iscalars
    fracr, fracc, spacing, sine, cose = fscalars
    R2 = 2 * R + 1
    wofs = jnp.float32(wsz * 0.5 - 0.5)

    fi = (lax.broadcasted_iota(jnp.int32, (RH, 128), 0) - R)
    fj = (lax.broadcasted_iota(jnp.int32, (RH, 128), 1) - R)
    fif = fi.astype(jnp.float32)
    fjf = fj.astype(jnp.float32)
    stepf = step.astype(jnp.float32)

    rpos = (stepf * (cose * fif + sine * fjf) - fracr) / spacing
    cpos = (stepf * (-sine * fif + cose * fjf) - fracc) / spacing
    rx = rpos + wofs
    cx = cpos + wofs
    r = iy + fi * step
    c = ix + fj * step
    ok = ((jnp.abs(fi) <= irad) & (jnp.abs(fj) <= irad)
          & (fi + R < R2) & (fj + R < R2)
          & (rx > -1) & (rx < wsz) & (cx > -1) & (cx < wsz)
          & (r >= 1 + s) & (r < ih - 1 - s)
          & (c >= 1 + s) & (c < iw - 1 - s))
    widx = jnp.trunc(jnp.clip(rpos * rpos + cpos * cpos, 0, 39))
    weight = jnp.exp(-(widx + jnp.float32(0.5)) * jnp.float32(0.125))
    r255 = jnp.float32(0.003921568627)
    dxx = weight * dxv * r255
    dyy = weight * dyv * r255
    if upright:
        dx, dy = dxx, dyy
    else:
        dx = cose * dxx + sine * dyy
        dy = sine * dxx - cose * dyy

    zero = jnp.float32(0.0)
    if not extended:
        ov = [jnp.where(dx < 0, dx, zero), jnp.where(dx < 0, zero, dx),
              jnp.where(dy < 0, dy, zero), jnp.where(dy < 0, zero, dy)]
    else:
        adx, ady = jnp.abs(dx), jnp.abs(dy)
        ny_, nx_ = dyy < 0, dxx < 0
        ov = [jnp.where(ny_, dx, zero), jnp.where(ny_, zero, dx),
              jnp.where(ny_, adx, zero), jnp.where(ny_, zero, adx),
              jnp.where(nx_, dy, zero), jnp.where(nx_, zero, dy),
              jnp.where(nx_, ady, zero), jnp.where(nx_, zero, ady)]

    ri = jnp.floor(rx).astype(jnp.int32)
    ci = jnp.floor(cx).astype(jnp.int32)
    rfrac = rx - ri.astype(jnp.float32)
    cfrac = cx - ci.astype(jnp.float32)

    def bin_w(i0, frac, a):
        return (jnp.where(i0 == a, 1.0 - frac, zero)
                + jnp.where(i0 == a - 1, frac, zero))

    if upright:
        # rx depends on the sample row only and cx on the sample column
        # only, so with lane l decoding to (a, b, o) the bilinear weights
        # factor as wao[r, l] = RowW[(a,o), r] (independent of b) and
        # wbo[j, l] = ColW[j, b] (independent of a, o).  The descriptor
        # therefore contracts as two TINY chained matmuls
        #     D[(a,o), b] = RowW (RA, osz*RH) @ vcat (osz*RH, 128)
        #                   @ ColW (128, wsz)
        # instead of the dense 128-lane outer-product form (~20x fewer
        # MACs, and the weight builds shrink from (osz*RH, 128) /
        # (128, 128) grids to (RA, osz*RH) / (128, wsz) tiles), followed
        # by a static rearrangement of the (RA, wsz) result into the
        # (a*wsz+b)*osz+o lane layout.
        RA = wsz * osz               # rows (a, o) = a*osz + o
        RAp = max(_round_up(RA, 8), 8)
        WSP = 8                      # wsz lanes padded up

        def d32(a, b):
            return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.HIGHEST)

        # RowW (RAp, osz*RH): column e = (o', fi); row r = (a, o).
        e_fi = lax.broadcasted_iota(jnp.int32, (RAp, osz * RH), 1) % RH
        e_o = lax.broadcasted_iota(jnp.int32, (RAp, osz * RH), 1) // RH
        r_i = lax.broadcasted_iota(jnp.int32, (RAp, osz * RH), 0)
        r_a = r_i // osz
        r_o = r_i - r_a * osz
        fi_r = e_fi - R
        rx_r = (stepf * cose * fi_r.astype(jnp.float32) - fracr) \
            / spacing + wofs
        rr_ = iy + fi_r * step
        ok_r = ((jnp.abs(fi_r) <= irad) & (e_fi < R2)
                & (rx_r > -1) & (rx_r < wsz)
                & (rr_ >= 1 + s) & (rr_ < ih - 1 - s))
        ri_r = jnp.floor(rx_r).astype(jnp.int32)
        rf_r = rx_r - ri_r.astype(jnp.float32)
        roww = jnp.where(ok_r & (e_o == r_o) & (r_i < RA),
                         bin_w(ri_r, rf_r, r_a), zero)

        # ColW built with j on LANES — the natural axis for the per-
        # column profile math (1 vreg per op instead of the 16 a
        # (128, WSP) layout costs) — and contracted transposed.
        fj_c = lax.broadcasted_iota(jnp.int32, (WSP, 128), 1) - R
        b_r = lax.broadcasted_iota(jnp.int32, (WSP, 128), 0)
        cx_c = (stepf * cose * fj_c.astype(jnp.float32) - fracc) \
            / spacing + wofs
        cc_ = ix + fj_c * step
        ok_c = ((jnp.abs(fj_c) <= irad) & (fj_c + R < R2)
                & (cx_c > -1) & (cx_c < wsz)
                & (cc_ >= 1 + s) & (cc_ < iw - 1 - s))
        ci_c = jnp.floor(cx_c).astype(jnp.int32)
        cf_c = cx_c - ci_c.astype(jnp.float32)
        colwT = jnp.where(ok_c & (b_r < wsz),
                          bin_w(ci_c, cf_c, b_r), zero)   # (WSP, 128)

        vcat = jnp.concatenate(ov, axis=0)         # (osz*RH, 128)
        D = lax.dot_general(d32(roww, vcat), colwT,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)  # (RAp, WSP)

        # rearrange D[(a,o), b] -> lane (a*wsz+b)*osz+o: widen b to the
        # lane layout with a static one-hot, then row-select (a, o).
        lane = lax.broadcasted_iota(jnp.int32, (WSP, 128), 1)
        nfeat = wsz * wsz * osz
        eb = jnp.where((lax.broadcasted_iota(jnp.int32, (WSP, 128), 0)
                        == (lane // osz) % wsz) & (lane < nfeat),
                       jnp.float32(1.0), zero)
        D3 = d32(D, eb)                            # (RAp, 128)
        lane_r = lax.broadcasted_iota(jnp.int32, (RAp, 128), 1)
        row_r = lax.broadcasted_iota(jnp.int32, (RAp, 128), 0)
        ea = (row_r == (lane_r // (wsz * osz)) * osz + lane_r % osz) \
            & (row_r < RA) & (lane_r < nfeat)
        return jnp.sum(jnp.where(ea, D3, zero), axis=0)

    # rotated: rx/cx depend on both sample axes; masked reductions per
    # (a, b) bin pair, accumulated into static one-hot lanes.  Keep the
    # static unroll: a fori_loop with dynamic bin indices was ~2.4 us
    # per keypoint slower (Mosaic loop overhead, +13 ms on the rotated
    # pair bench) despite 16x less kernel code.
    okf = ok.astype(jnp.float32)
    desc = jnp.zeros((1, 128), jnp.float32)
    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for a in range(wsz):
        wa = bin_w(ri, rfrac, a)
        for b in range(wsz):
            t = wa * bin_w(ci, cfrac, b) * okf
            for o in range(osz):
                val = jnp.sum(t * ov[o])
                l = (a * wsz + b) * osz + o
                desc = desc + jnp.where(lane == l, val, zero)
    return desc[0]


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

# TEMPORARY ablation knob for floor analysis (timing only, wrong
# results): "nobin" replaces the binning with a trivial reduction;
# "nostageb" additionally skips the column-combination matmuls.
_ABLATE = os.environ.get("SURF_DESC_ABLATE", "")


def _emit_group_kp(meta_ref, fpar_ref, acc, out_ref, j, k, r0_t, c0_t, *,
                   R, RH, WC, m2, cfg_s, ablate=None):
    """Per-keypoint emit shared by the tile kernels: stage B (column
    combination from a dynamic (2RH, WC) window of the group
    accumulator, re-anchored so `m2` limbs stay exact) + descriptor
    binning.  `j` is the keypoint's slot within the group, `k` its row
    in meta/out."""
    RW = 2 * RH
    if ablate is None:
        ablate = _ABLATE
    cs = pl.multiple_of(meta_ref[1, k], 128)
    ixl_w = meta_ref[3, k] - cs
    isc = (meta_ref[2, k], ixl_w, meta_ref[4, k], meta_ref[5, k],
           meta_ref[6, k])
    Aw = acc[pl.ds(j * RW, RW), pl.ds(cs, WC)]
    if ablate == "nostageb":
        out_ref[k] = Aw[:1, :128].astype(jnp.float32)[0]
        return
    Aw = Aw - Aw[:, 0:1]
    # ONE merged stage-B dot instead of 2 stencils x m2 limbs: balanced
    # digits of Aw stacked along M, [cdy | cdx] along N; limb blocks
    # recombine by shifts after the dot.  Same MXU tile passes, 1/6 the
    # issue count.
    digs = []
    t = Aw
    for li in range(m2):
        if li == m2 - 1:
            d = t
        else:
            d = ((t & 255) ^ 128) - 128
            t = (t - d) >> 8
        digs.append(d.astype(jnp.int8))
    dstk = jnp.concatenate(digs, axis=0)              # (m2*RW, WC)
    if ablate == "nocolw":   # timing probe: skip the weight build
        cw = (lax.broadcasted_iota(jnp.int32, (WC, 256), 0)
              == lax.broadcasted_iota(jnp.int32, (WC, 256), 1)
              ).astype(jnp.int8)
    else:
        cw = _col_weights_cat(isc, R=R, WC=WC).astype(jnp.int8)
    g = lax.dot_general(dstk, cw, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    G = g[:RW]
    for li in range(1, m2):
        G = G + (g[li * RW:(li + 1) * RW] << (8 * li))
    dyv = G[:RH, 0:128].astype(jnp.float32)
    dxv = G[RH:, 128:256].astype(jnp.float32)
    if ablate == "nobin":
        out_ref[k] = dyv[0] + dxv[0]
        return
    gscalars = (r0_t + meta_ref[2, k] - meta_ref[7, k],
                c0_t + meta_ref[3, k],
                meta_ref[4, k], meta_ref[5, k], meta_ref[6, k])
    fscalars = (fpar_ref[0, k], fpar_ref[1, k], fpar_ref[2, k],
                fpar_ref[3, k], fpar_ref[4, k])
    out_ref[k] = _bin_descriptor(
        dyv, dxv, gscalars, fscalars, R=R, RH=RH, cfg_s=cfg_s)


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
