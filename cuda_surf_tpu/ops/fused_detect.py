"""Fused per-octave detection: response layers + NMS candidate mask in
one Pallas pass over VMEM-resident phase planes.

TPU-native re-derivation of the back-to-back calcHessianMulti +
findMaximumWithInterp launches (surfd.cu:445-481, 676-832).  The XLA
formulation of the same math (ops/hessian.py + ops/extrema.py
_candidate_mask) compiles to ~104 separate fusion kernels plus 12
reduce_windows for the stereo-pair pipeline — the pyramid+NMS stages
are kernel-count bound, not FLOP bound (~4 ms/frame of the ~11 ms
total at round-2 start).  Here each octave becomes ONE kernel:

1.  The octave's stride-d integral "phase planes" (only the (row%d,
    col%d) classes its box-filter corners actually touch) are packed
    into a single tile-aligned (NP, hp, wq) int32 tensor by
    integral.phase_planes_packed — two MXU matmuls + aligned slices.
2.  The kernel holds the pack in VMEM and evaluates every scale's
    box-filter Hessian determinant as static-offset slice reads
    (exact int32 corner sums, f32 determinant — the same expression
    tree as ops/hessian._response_layer), INCLUDING the two seed
    layers of octaves > 0, which are computed directly from this
    octave's planes at the previous octave's mask geometry instead of
    strided decimation of the previous octave's output (bit-identical:
    the decimated positions read the very same integral-image entries).
3.  The 3x3x3 NMS + 0.8*thresh prefilter + per-scale-pair cell windows
    (ops/extrema._candidate_mask semantics, tie behaviour included)
    run on the VMEM-resident layers; the mask ships as int8.

Outputs per octave: (ms, oh, ow) f32 layers (identical to
hessian.response_pyramid up to f32 FMA contraction order in the
determinant) and the (ms, oh, ow) candidate mask.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SurfConfig, OctaveSchedule
from .integral import phase_planes_packed


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sbox_corners(x1, y1, x2, y2):
    """getSum corner offsets (surfd.cu:334-343): (sign, dy, dx) terms,
    in the XLA path's evaluation order ((a + b) - c) - d."""
    return [(1, y1 + 1, x1 + 1), (1, y2, x2),
            (-1, y2, x1 + 1), (-1, y1 + 1, x2)]


def _layer_spec(sp):
    """Static read plan for one response layer.

    Corner offsets are kept raw: a layer embedded at output origin
    (row0, col0) evaluates position t by reading
    plane[dy % d][row0 + dy//d + t], i.e. ii[d*(row0 + t) + dy].  For
    real layers row0 is the scale's border1 (matching
    hessian._response_layer); for the seed layers of octaves > 0,
    row0 is the first grid row whose decimated source position lies
    inside the previous octave's nonzero region — the reads then land
    on exactly the integral entries the decimation path would copy
    (prev layer at position 2y reads ii[d_prev*2y + dy] =
    ii[d*y + dy]).
    """
    m, x2, x3, x4 = sp.mask_size, sp.x2, sp.x3, sp.x4

    def sb(a, b, c, dd):
        return _sbox_corners(a, b, c, dd)

    return dict(
        dxx_a=sb(m + x2, x3, -m - x2, -x3),
        dxx_b=sb(x2, x3, -x2, -x3),
        dyy_a=sb(x3, m + x2, -x3, -m - x2),
        dyy_b=sb(x3, x2, -x3, -x2),
        dxy=(sb(x4, 0, 0, -x4) + sb(0, x4, -x4, 0)
             + [(-s, dy, dx) for (s, dy, dx) in sb(x4, x4, 0, 0)]
             + [(-s, dy, dx) for (s, dy, dx) in sb(0, 0, -x4, -x4)]),
        norm=np.float32(sp.norm),
    )


def octave_plan(cfg: SurfConfig, scheds, shapes, o: int):
    """All static geometry for octave o's fused kernel."""
    sched = scheds[o]
    oh, ow = shapes[o]
    d = sched.scales[0].delta
    ms = cfg.max_scale

    layers = []
    if o > 0:
        prev = scheds[o - 1]
        poh, pow_ = shapes[o - 1]
        for li in (ms - 3, ms - 1):
            sp = prev.scales[li - prev.init_scale]
            b1 = sp.border1
            # previous-octave layer is zero outside rows/cols
            # [b1, prev_dim - b1); decimated position y maps to 2y
            r_lo, r_hi = -(-b1 // 2), min((poh - b1 + 1) // 2, oh)
            c_lo, c_hi = -(-b1 // 2), min((pow_ - b1 + 1) // 2, ow)
            layers.append(dict(spec=_layer_spec(sp),
                               ny=max(r_hi - r_lo, 0),
                               nx=max(c_hi - c_lo, 0),
                               row0=r_lo, col0=c_lo))
    for sp in sched.scales:
        b1 = sp.border1
        ny, nx = oh - 2 * b1, ow - 2 * b1
        layers.append(dict(spec=_layer_spec(sp),
                           ny=max(ny, 0), nx=max(nx, 0), row0=b1, col0=b1))
    assert len(layers) == ms

    # plane classes + padded plane extents covering every read
    keys, max_r, max_c = set(), 8, 128
    for ly in layers:
        for grp in ("dxx_a", "dxx_b", "dyy_a", "dyy_b", "dxy"):
            for (_, dy, dx) in ly["spec"][grp]:
                keys.add((dy % d, dx % d))
                assert ly["row0"] + dy // d >= 0, (o, dy, ly["row0"])
                assert ly["col0"] + dx // d >= 0, (o, dx, ly["col0"])
                max_r = max(max_r, ly["row0"] + dy // d + ly["ny"])
                max_c = max(max_c, ly["col0"] + dx // d + ly["nx"])
    keys = sorted(keys)
    hp = _round_up(max_r, 8)
    wq = _round_up(max_c, 128)

    # NMS cell windows (extrema._candidate_mask)
    mborders = sched.maximum_borders()
    windows = {}
    for s in range(1, ms - 1):
        z = (s - 1) // 2
        if z < len(mborders):
            mb = mborders[z]
            assert mb >= 1, "NMS window must exclude the 1-cell border"
            hc = max(0, (oh - 2 * mb - 1) // 2 + 1)
            wc = max(0, (ow - 2 * mb - 1) // 2 + 1)
            windows[s] = (mb, mb + 2 * hc, mb, mb + 2 * wc)
    return dict(d=d, oh=oh, ow=ow, ms=ms, layers=layers, keys=keys,
                hp=hp, wq=wq, windows=windows)


def _octave_kernel(planes_ref, layers_ref, cand_ref, *, plan, thresh,
                   clo, chi, elo, ehi):
    """One row band: compute layer rows [clo, chi) (the emitted rows
    [elo, ehi) plus the 1-row NMS halo) and the candidate mask for
    [elo, ehi).  Single-band octaves use clo=elo=0, chi=ehi=oh."""
    oh, ow, ms = plan["oh"], plan["ow"], plan["ms"]
    d = plan["d"]
    slot = {k: i for i, k in enumerate(plan["keys"])}
    ch8 = _round_up(chi - clo, 8)
    ow128 = _round_up(ow, 128)
    rr = np.float32(0.003921568627) * np.float32(0.003921568627)

    for li, ly in enumerate(plan["layers"]):
        # clip the layer's embed rectangle to the compute band
        r_start = max(ly["row0"], clo)
        r_end = min(ly["row0"] + ly["ny"], chi)
        ny, nx = r_end - r_start, ly["nx"]
        c0 = ly["col0"]
        layers_ref[li] = jnp.zeros((ch8, ow128), jnp.float32)
        if ny <= 0 or nx <= 0:
            continue

        def rd(offy, offx):
            ry, cx = r_start + offy // d, c0 + offx // d
            return planes_ref[slot[(offy % d, offx % d)],
                              ry: ry + ny, cx: cx + nx]

        def sbox(terms):
            a, b, c, e = terms
            return ((rd(a[1], a[2]) * a[0] + rd(b[1], b[2]) * b[0])
                    + rd(c[1], c[2]) * c[0]) + rd(e[1], e[2]) * e[0]

        sp = ly["spec"]
        dxx = (sbox(sp["dxx_a"]) - 3 * sbox(sp["dxx_b"])
               ).astype(jnp.float32)
        dyy = (sbox(sp["dyy_a"]) - 3 * sbox(sp["dyy_b"])
               ).astype(jnp.float32)
        dxy_i = (((sbox(sp["dxy"][0:4]) + sbox(sp["dxy"][4:8]))
                  + sbox(sp["dxy"][8:12])) + sbox(sp["dxy"][12:16]))
        dxy = jnp.float32(0.6) * dxy_i.astype(jnp.float32)
        det = rr * (dxx * dyy - dxy * dxy) * sp["norm"]

        layers_ref[li, r_start - clo:r_end - clo, c0:c0 + nx] = det

    # --- NMS mask (extrema._candidate_mask semantics) -------------------
    pre_t = jnp.float32(0.8) * jnp.float32(thresh)
    bh = ehi - elo
    bh32 = _round_up(bh, 32)
    # mask rows restricted to the interior [1, oh-1) of the image
    m_lo, m_hi = max(elo, 1), min(ehi, oh - 1)
    ny, nx = m_hi - m_lo, ow - 2
    for s in range(ms):
        win = plan["windows"].get(s)
        cand_ref[s] = jnp.zeros((bh32, ow128), jnp.int8)
        if win is None or ny <= 0 or nx <= 0:
            continue
        m3 = jnp.maximum(jnp.maximum(layers_ref[s - 1], layers_ref[s]),
                         layers_ref[s + 1])
        # 3x3 spatial max around rows [m_lo, m_hi), cols [1, ow-1)
        nb = None
        for dr in (0, 1, 2):
            for dc in (0, 1, 2):
                v = m3[m_lo - 1 - clo + dr: m_lo - 1 - clo + dr + ny,
                       dc:dc + nx]
                nb = v if nb is None else jnp.maximum(nb, v)
        ctr = layers_ref[s][m_lo - clo: m_lo - clo + ny, 1:1 + nx]
        r = lax.broadcasted_iota(jnp.int32, (ny, nx), 0) + m_lo
        c = lax.broadcasted_iota(jnp.int32, (ny, nx), 1) + 1
        r_lo, r_hi, c_lo, c_hi = win
        ok = ((ctr >= pre_t) & (ctr >= nb)
              & (r >= r_lo) & (r < r_hi) & (c >= c_lo) & (c < c_hi))
        cand_ref[s, m_lo - elo:m_lo - elo + ny, 1:1 + nx] = \
            ok.astype(jnp.int8)


def fused_octave(planes, plan, cfg: SurfConfig, interpret: bool = False,
                 max_band_bytes: int = 6 * 2 ** 20):
    """planes: (NP, hp, wq) int32 pack -> (layers (ms, oh, ow) f32,
    mask (ms, oh, ow) bool).  Octaves whose full layer stack would
    blow the VMEM budget are processed in independent row bands (each
    band re-reads the plane pack; only octave 0 needs more than one
    band at 1080p-class inputs)."""
    oh, ow, ms = plan["oh"], plan["ow"], plan["ms"]
    ow128 = _round_up(ow, 128)
    np_, hp, wq = planes.shape
    # keep producer fusions (pad / dynamic-update-slice chains in the
    # batched frontend) out of the kernel's scoped-vmem stack: at B=8
    # XLA fused them into the custom-call operand and blew the scoped
    # limit by ~170K
    planes = lax.optimization_barrier(planes)

    full_bytes = ms * _round_up(oh, 8) * ow128 * 5
    # the plane pack rides the kernel's scoped-vmem stack when XLA
    # fuses its producer into the operand (observed in the B=8 batched
    # program), so the band budget must leave room for it under the
    # ~11.85M scoped limit
    plane_bytes = np_ * hp * wq * 4
    band_budget = max(2 * 2 ** 20,
                      11 * 2 ** 20 - plane_bytes - 4 * 2 ** 20)
    nbands = max(1, -(-full_bytes // min(max_band_bytes, band_budget)))
    bstep = _round_up(-(-oh // nbands), 8)
    bands = [(b * bstep, min((b + 1) * bstep, oh))
             for b in range(-(-oh // bstep))]

    lparts, cparts = [], []
    for (elo, ehi) in bands:
        clo, chi = max(elo - 1, 0), min(ehi + 1, oh)
        ch8 = _round_up(chi - clo, 8)
        bh32 = _round_up(ehi - elo, 32)
        kernel = functools.partial(
            _octave_kernel, plan=plan, thresh=cfg.thresh,
            clo=clo, chi=chi, elo=elo, ehi=ehi)
        vmem = (np_ * hp * wq * 4 + ms * ch8 * ow128 * 4
                + ms * bh32 * ow128 + 4 * 2 ** 20)
        layers, cand = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((ms, ch8, ow128), jnp.float32),
                jax.ShapeDtypeStruct((ms, bh32, ow128), jnp.int8)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(vmem, 15 * 2 ** 20)),
            interpret=interpret,
        )(planes)
        lparts.append(layers[:, elo - clo: ehi - clo, :ow])
        cparts.append(cand[:, :ehi - elo, :ow])
    if len(bands) == 1:
        return lparts[0], cparts[0] != 0
    return (jnp.concatenate(lparts, axis=1),
            jnp.concatenate(cparts, axis=1) != 0)


def fused_pyramid(image: jnp.ndarray, cfg: SurfConfig, h: int, w: int,
                  interpret: bool = False):
    """-> (pyr, masks): per-octave response layers + NMS candidate
    masks, replacing hessian.response_pyramid + extrema._candidate_mask
    on TPU (non-doubled).  Requires the raw uint8 image (phase planes
    are built from it with exact triangular MXU matmuls)."""
    shapes = cfg.octave_shapes(h, w)
    scheds = cfg.hessian_schedule(h, w)
    pyr, masks = [], []
    for o in range(cfg.noctaves):
        plan = octave_plan(cfg, scheds, shapes, o)
        planes = phase_planes_packed(image, plan["d"], plan["keys"],
                                     plan["hp"], plan["wq"])
        layers, cand = fused_octave(planes, plan, cfg, interpret=interpret)
        pyr.append(layers)
        masks.append(cand)
    return pyr, masks


def use_fused(cfg: SurfConfig) -> bool:
    m = getattr(cfg, "detect_backend", "auto")
    if cfg.doubled:
        return False
    if m == "auto":
        return jax.default_backend() == "tpu"
    return m in ("fused", "fused_interpret")
