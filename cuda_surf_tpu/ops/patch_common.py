"""Shared low-level machinery for the Pallas patch-wavelet kernels.

Selection-weight builders, the exact balanced base-256 limb
decomposition / MXU contraction helpers, and the in-kernel SURF
descriptor binning shared by the supertile kernels
(:mod:`.patch_wavelets`) and the span-bucketed / step-decimated
fallback kernels (:mod:`.patch_bucketed`).  See patch_wavelets for the
math derivation and reference citations (surfd.cu lines per function).
"""

from __future__ import annotations

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
    if ablate == "noemit":   # probe: pure loop + scalar-read + store
        out_ref[k] = (jnp.zeros((128,), jnp.float32)
                      + meta_ref[2, k].astype(jnp.float32))
        return
    cs = pl.multiple_of(meta_ref[1, k], 128)
    ixl_w = meta_ref[3, k] - cs
    isc = (meta_ref[2, k], ixl_w, meta_ref[4, k], meta_ref[5, k],
           meta_ref[6, k])
    Aw = acc[pl.ds(j * RW, RW), pl.ds(cs, WC)]
    if ablate == "nostageb":
        out_ref[k] = Aw[:1, :128].astype(jnp.float32)[0]
        return
    Aw = Aw - Aw[:, 0:1]
    # NOTE round 5: a merged single stage-B dot (digits stacked along M,
    # [cdy|cdx] along N) measured neutral AND its dx lane block
    # miscompiled on hardware in two kernel contexts (rotated descriptor
    # golden cosine 0.68; the grids-supertile experiment) while the
    # interpreter was exact — reverted to the separate per-stencil dots.
    cdy, cdx = _col_weights(0, isc, R=R, CC=WC,
                            masked=ablate != "nocolw")
    dyv = _dot_limbs(Aw[:RH], cdy, m2).astype(jnp.float32)
    dxv = _dot_limbs(Aw[RH:], cdx, m2).astype(jnp.float32)
    if ablate == "nobin":
        out_ref[k] = dyv[:1, :128][0] + dxv[:1, :128][0]
        return
    gscalars = (r0_t + meta_ref[2, k] - meta_ref[7, k],
                c0_t + meta_ref[3, k],
                meta_ref[4, k], meta_ref[5, k], meta_ref[6, k])
    fscalars = (fpar_ref[0, k], fpar_ref[1, k], fpar_ref[2, k],
                fpar_ref[3, k], fpar_ref[4, k])
    out_ref[k] = _bin_descriptor(
        dyv, dxv, gscalars, fscalars, R=R, RH=RH, cfg_s=cfg_s)


