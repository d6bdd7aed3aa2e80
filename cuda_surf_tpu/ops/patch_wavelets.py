"""Batched Haar-wavelet sampling as a Pallas TPU kernel.

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
    (column-combination matrix): two MXU matmuls against +/-1 selection
    matrices built from iota comparisons — no gathers at all.

2.  The matmuls are *exact* despite float hardware: the integer operand
    is split into <=8-bit limbs (each exact in bfloat16), every limb dot
    against the +/-1 selection matrices is exact in the MXU's f32
    accumulator, and the limbs are recombined in int32 arithmetic.  The
    patch's first column is subtracted per row first (its contribution
    cancels because every column stencil has zero coefficient sum),
    which keeps the final wavelet values below 2^24.

Keypoints are bucketed by patch extent (powers of two from 128), each
bucket running one pallas_call whose grid covers a static capacity in
chunks; a dynamic-trip-count inner loop skips unused capacity, and patch
DMAs are double-buffered against compute.
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


def use_pallas(cfg) -> bool:
    """Resolve cfg.wavelet_method: Pallas on TPU hardware (or when forced),
    the XLA gather path elsewhere."""
    m = cfg.wavelet_method
    if m == "auto":
        return jax.default_backend() == "tpu"
    return m in ("pallas", "interpret")


def bucket_specs(h_pad: int, w_pad: int, max_span: int):
    """Static per-bucket patch shapes.

    Returns a list of (span_limit, E_r, E_c): keypoints whose sample
    footprint half-extent ("span" = irad*step + s + 1) is <= span_limit
    get an (E_r, E_c) integral-image patch.  Extents double per bucket;
    once the patch covers the whole (padded) image every span fits.
    Patch origins are aligned down to the (8, 128) VMEM tile, so the
    usable extent shrinks by one tile worth of slack per axis.
    """
    specs = []
    e = 128
    while True:
        er, ec = min(e, h_pad), min(2 * e, w_pad)
        # The patch must hold rows/cols [i - span, i + span + 1] around the
        # keypoint: origins are pre-biased then aligned down to the (8,128)
        # tile, leaving the keypoint within half a tile of centre, so each
        # margin is at least E/2 - tile/2 - 2.
        lim_r = 10 ** 9 if er >= h_pad else er // 2 - 6
        lim_c = 10 ** 9 if ec >= w_pad else ec // 2 - 66
        lim = min(lim_r, lim_c)
        specs.append((lim, er, ec))
        if lim >= max_span:
            break
        e *= 2
    return specs


def _wavelet_kernel(count_ref, meta_ref, ii_ref, out_ref, patch, sem,
                    *, R, E_r, E_c, E_rp, E_cp, RC, CC, CH, NBUF, RW):
    """One grid step computes dy/dx sample grids for up to CH keypoints.

    meta is (8, cap) int32 — rows [r0, c0, iyl, ixl, step, s, irad, _]
    (patch origin, keypoint position local to the patch, sample spacing,
    wavelet half-size, sample radius); transposed so the SMEM minor dim is
    the 128-aligned capacity.  Output block (CH, RW, 128): rows [0,R2) x cols [0,R2) hold
    dy(i,j); rows [R2,2*R2) x cols [64,64+R2) hold dx(i,j).
    """
    R2 = 2 * R + 1
    gid = pl.program_id(0)
    count = count_ref[0]
    base = gid * CH

    def dma(k, slot):
        r0 = pl.multiple_of(meta_ref[0, k], 8)
        c0 = pl.multiple_of(meta_ref[1, k], 128)
        return pltpu.make_async_copy(
            ii_ref.at[pl.ds(r0, E_r), pl.ds(c0, E_c)],
            patch.at[slot, pl.ds(0, E_r), pl.ds(0, E_c)], sem.at[slot])

    if NBUF == 2:
        @pl.when((gid == 0) & (count > 0))
        def _():
            dma(0, 0).start()

    n_here = jnp.clip(count - base, 0, CH)

    def body(j, carry):
        k = base + j
        slot = lax.rem(k, NBUF)
        if NBUF == 2:
            @pl.when(k + 1 < count)
            def _():
                dma(k + 1, lax.rem(k + 1, NBUF)).start()
        else:
            dma(k, 0).start()
        dma(k, slot).wait()

        iyl = meta_ref[2, k]
        ixl = meta_ref[3, k]
        step = meta_ref[4, k]
        s = meta_ref[5, k]
        irad = meta_ref[6, k]

        # Tiled evaluation of G = Rw @ rel @ Cw, where rel is the patch
        # minus its first column (per row), Rw (RW, E_r) holds the dy/dx
        # row-combination weights (rows [0,R2) dy, [R2,2*R2) dx) and
        # Cw (E_c, 128) the column weights (cols [0,R2) dy, [64,64+R2) dx).
        # fori tiles keep the float32 patch copy and all iota temporaries
        # bounded (and reused) regardless of the bucket's patch extent.
        # The scratch's padded tail rows/cols hold garbage, which only
        # ever feeds samples outside the image — masked by callers.
        #
        # Exactness: the integer operand of each matmul is split into
        # <=8-bit limbs (exact in bfloat16); the weight matrices are +/-1,
        # so every limb product and its f32-accumulated dot (<= 4 nonzero
        # terms, |d| <= 1020) is exact.  The limbs are recombined in int32
        # — each limb dot converts exactly and int32 wraparound is modular,
        # so the recombined value is exact whenever the true result is in
        # range (wavelet values < 2^24).  f32 limb recombination would NOT
        # be: `rel` entries are rectangle sums bounded only by 255*E_r*E_c
        # (~2^28), so scaled limb components pass through magnitudes where
        # f32 rounds.
        def _limb(xi, li, last):
            # top limb keeps the sign (arithmetic shift), lower limbs are
            # masked to 8 bits; recombination is exact for any int32.
            p = xi >> (8 * li)
            return (p if last else (p & 255)).astype(jnp.bfloat16)

        def dot_limbs(xi, w, limbs, left=False):
            """Exact int32 (xi:int32) @ (w:+/-1) — or w @ xi when `left` —
            via bf16 limb matmuls and int32 limb recombination."""
            wb = w.astype(jnp.bfloat16)
            acc = None
            for li in range(limbs):
                part = _limb(xi, li, li == limbs - 1)
                ab = (wb, part) if left else (part, wb)
                d = lax.dot_general(ab[0], ab[1], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                di = d.astype(jnp.int32) << (8 * li)
                acc = di if acc is None else acc + di
            return acc

        # `rel` entries are rectangle sums reaching back to image row 0
        # (up to 255 * image_height * E_c ~ 2^28+), and |A| <= 2*max|rel|:
        # 4 limbs cover the full int32 range, keeping the top limb <= 2^8
        # so every limb stays bf16-exact.
        m1_limbs = m2_limbs = 4

        def cc_body(ci, G):
            cc = pl.multiple_of(ci * CC, 128)
            ec = cc + lax.broadcasted_iota(jnp.int32, (CC, 128), 0)
            jc = lax.broadcasted_iota(jnp.int32, (CC, 128), 1)
            is_dy_c = jc < R2
            gj = jnp.where(is_dy_c, jc, jc - 64)
            ok_c = (jnp.abs(gj - R) <= irad) & (
                is_dy_c | ((jc >= 64) & (jc < 64 + R2)))
            bc = ixl + (gj - R) * step

            def eqc(t):
                return (ec == t).astype(jnp.int32)

            c_dy = eqc(bc + s + 1) - eqc(bc - s)
            c_dx = eqc(bc + s + 1) + eqc(bc - s) - eqc(bc) - eqc(bc + 1)
            Cw = jnp.where(ok_c, jnp.where(is_dy_c, c_dy, c_dx), 0
                           ).astype(jnp.float32)

            def cb_body(bi, A):
                cb = pl.multiple_of(bi * RC, 8)
                ri = lax.broadcasted_iota(jnp.int32, (RW, RC), 0)
                e = cb + lax.broadcasted_iota(jnp.int32, (RW, RC), 1)
                is_dy = ri < R2
                g = jnp.where(is_dy, ri, ri - R2)
                ok_r = (jnp.abs(g - R) <= irad) & (ri < 2 * R2)
                br = iyl + (g - R) * step

                def eq(t):
                    return (e == t).astype(jnp.int32)

                w_dy = eq(br) + eq(br + 1) - eq(br - s) - eq(br + s + 1)
                w_dx = eq(br + s + 1) - eq(br - s)
                Rw = jnp.where(ok_r, jnp.where(is_dy, w_dy, w_dx), 0
                               ).astype(jnp.float32)

                pc = patch[slot, pl.ds(cb, RC), pl.ds(cc, CC)]
                pb = patch[slot, pl.ds(cb, RC), 0:1]
                return A + dot_limbs(pc - pb, Rw, m1_limbs, left=True)

            A = lax.fori_loop(0, E_rp // RC, cb_body,
                              jnp.zeros((RW, CC), jnp.int32))
            return G + dot_limbs(A, Cw, m2_limbs)

        G = lax.fori_loop(0, E_cp // CC, cc_body,
                          jnp.zeros((RW, 128), jnp.int32))
        out_ref[j] = G.astype(jnp.float32)
        return carry

    lax.fori_loop(0, n_here, body, 0)

    def zero_body(j, carry):
        out_ref[j] = jnp.zeros((RW, 128), jnp.float32)
        return carry

    lax.fori_loop(n_here, CH, zero_body, 0)


def _bucket_call(ii_pad, count, meta, *, R, E_r, E_c, cap, interpret):
    R2 = 2 * R + 1
    RW = _round_up(2 * R2, 8)
    RC, CC = min(E_r, 256), min(E_c, 512)
    E_rp, E_cp = _round_up(E_r, RC), _round_up(E_c, CC)
    CH = 16 if E_r * E_c <= 512 * 512 else 4
    cap = _round_up(cap, CH)
    NBUF = 2 if E_rp * E_cp * 4 * 2 <= 6 * 1024 * 1024 else 1
    kernel = functools.partial(
        _wavelet_kernel, R=R, E_r=E_r, E_c=E_c, E_rp=E_rp, E_cp=E_cp,
        RC=RC, CC=CC, CH=CH, NBUF=NBUF, RW=RW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap // CH,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((CH, RW, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, E_rp, E_cp), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    vmem_limit = min(NBUF * E_rp * E_cp * 4 + 8 * 2 ** 20, 18 * 2 ** 20)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, RW, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(count, meta, ii_pad)


def wavelet_grids(ii, ix, iy, step, iscale, irad, valid, *, R, max_span,
                  caps=None, interpret=False):
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
    RW = _round_up(2 * R2, 8)
    h, w = ii.shape
    h_pad, w_pad = _round_up(h, 8), _round_up(w, 128)
    ii_pad = jnp.pad(ii, ((0, h_pad - h), (0, w_pad - w)))

    specs = bucket_specs(h_pad, w_pad, max_span)
    nb = len(specs)
    if caps is None:
        caps = [max(K >> b, 128) for b in range(nb)]
    caps = [_round_up(min(c, _round_up(K, 16)), 16) for c in caps]
    max_cap = max(caps)

    span = irad * step + iscale + 1
    key = jnp.zeros((K,), jnp.int32)
    for lim, _, _ in specs[:-1]:
        key += (span > lim).astype(jnp.int32)
    key = jnp.where(valid, key, nb)

    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    order_pad = jnp.concatenate([order, jnp.zeros((max_cap,), jnp.int32)])
    cnts = jnp.stack([jnp.sum(key == b).astype(jnp.int32)
                      for b in range(nb)])
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(cnts)[:-1]])

    sorted_dy = jnp.zeros((K + max_cap, R2, R2), jnp.float32)
    sorted_dx = jnp.zeros((K + max_cap, R2, R2), jnp.float32)

    for b, (lim, E_r, E_c) in enumerate(specs):
        cap = caps[b]
        sel = lax.dynamic_slice(order_pad, (starts[b],), (cap,))
        byi = jnp.take(iy, sel)
        bxi = jnp.take(ix, sel)
        # Centre the patch on the keypoint with the tile-alignment bias
        # folded in BEFORE rounding down, so both margins keep at least
        # E/2 - tile/2 usable extent (see bucket_specs limits).
        r0 = (jnp.clip(byi - E_r // 2 + 4, 0, h_pad - E_r) // 8) * 8
        c0 = (jnp.clip(bxi - E_c // 2 + 64, 0, w_pad - E_c) // 128) * 128
        meta = jnp.stack([
            r0, c0, byi - r0, bxi - c0,
            jnp.take(step, sel), jnp.take(iscale, sel),
            jnp.take(irad, sel), jnp.zeros((cap,), jnp.int32),
        ], axis=0)
        count = jnp.minimum(cnts[b], cap).reshape(1)
        G = _bucket_call(ii_pad, count, meta, R=R, E_r=E_r, E_c=E_c,
                         cap=cap, interpret=interpret)
        sorted_dy = lax.dynamic_update_slice(
            sorted_dy, G[:cap, :R2, :R2], (starts[b], 0, 0))
        sorted_dx = lax.dynamic_update_slice(
            sorted_dx, G[:cap, R2:2 * R2, 64:64 + R2], (starts[b], 0, 0))

    inv = jnp.zeros((K,), jnp.int32).at[order].set(
        jnp.arange(K, dtype=jnp.int32))
    return jnp.take(sorted_dy, inv, axis=0), jnp.take(sorted_dx, inv, axis=0)
