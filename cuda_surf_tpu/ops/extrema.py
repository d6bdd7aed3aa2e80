"""3x3x3 non-max extrema detection + iterative subpixel interpolation.

TPU-native re-derivation of findMaximumWithInterp (surfd.cu:676-832),
fitQuadrat (surfd.cu:942-988) and solveLinearSystem (surfd.cu:835-887).

The reference appends keypoints with atomicInc into a global array; TPU
has no global atomics, so detection is reformulated as:

  1. a dense vectorized pass that evaluates every 2x2x2 extrema cell
     (cell argmax in the reference's `cas` comparison order, then a
     27-neighbourhood max test — mathematically identical to the 26
     explicit rejection checks in surfd.cu:757-792),
  2. stream compaction of accepted cells into a fixed-size candidate
     buffer (types.compact), and
  3. a batched fixed-iteration interpolation walk (vmap over candidates,
     unrolled `moves_remain` rounds with convergence masking), with the
     3x3 system solved by the same partial-pivot Gaussian elimination in
     float32 so walk decisions track the reference's numerics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import SurfConfig, OctaveSchedule
from ..types import compact


def solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 float32 Gaussian elimination with partial pivoting
    (solveLinearSystem, surfd.cu:835-887).  Singular systems produce
    inf/nan which downstream rejection filters, as in the reference."""
    M = jnp.concatenate([A, b[:, None]], axis=1).astype(jnp.float32)

    def swap(M, i, p):
        rows = jnp.arange(3)
        perm = jnp.where(rows == i, p, jnp.where(rows == p, i, rows))
        return M[perm]

    p0 = jnp.argmax(jnp.abs(M[:, 0]))
    M = swap(M, 0, p0)
    M = M.at[1].add(-(M[1, 0] / M[0, 0]) * M[0])
    M = M.at[2].add(-(M[2, 0] / M[0, 0]) * M[0])
    p1 = 1 + jnp.argmax(jnp.abs(M[1:, 1]))
    M = swap(M, 1, p1)
    M = M.at[2].add(-(M[2, 1] / M[1, 1]) * M[1])
    x2 = M[2, 3] / M[2, 2]
    x1 = (M[1, 3] - M[1, 2] * x2) / M[1, 1]
    x0 = (M[0, 3] - M[0, 1] * x1 - M[0, 2] * x2) / M[0, 0]
    return jnp.stack([x0, x1, x2])


def _fit_quadrat(block: jnp.ndarray):
    """Gradient/Hessian from a (3,3,3) (scale, row, col) neighbourhood and
    the quadratic-fit offsets + peak strength (fitQuadrat)."""
    prv, cur, nxt = block[0], block[1], block[2]
    g = jnp.stack([
        (nxt[1, 1] - prv[1, 1]) * 0.5,
        (cur[2, 1] - cur[0, 1]) * 0.5,
        (cur[1, 2] - cur[1, 0]) * 0.5,
    ])
    t = cur[1, 1] + cur[1, 1]
    h01 = ((nxt[2, 1] - nxt[0, 1]) - (prv[2, 1] - prv[0, 1])) * 0.25
    h02 = ((nxt[1, 2] - nxt[1, 0]) - (prv[1, 2] - prv[1, 0])) * 0.25
    h12 = ((cur[2, 2] - cur[2, 0]) - (cur[0, 2] - cur[0, 0])) * 0.25
    H = jnp.array([
        [prv[1, 1] + nxt[1, 1] - t, h01, h02],
        [h01, cur[2, 1] + cur[0, 1] - t, h12],
        [h02, h12, cur[1, 2] + cur[1, 0] - t],
    ])
    off = solve3(H, -g)
    strength = cur[1, 1] + 0.5 * jnp.dot(off, g)
    return off, strength


def detect_octave(resp: jnp.ndarray, osched: OctaveSchedule, cfg: SurfConfig):
    """One octave: dense NMS + compaction + interpolation walk.

    resp: (max_scale, oh, ow) float32.  Returns dict of (cap,) arrays:
    valid, nx, ny, ns, strength (octave-local interpolated coords, ready
    for makePoint scaling).
    """
    _, oh, ow = resp.shape
    borders = jnp.asarray(osched.borders, jnp.int32)
    mborders = osched.maximum_borders()

    # --- dense cell pass -------------------------------------------------
    nbhd_max = lax.reduce_window(
        resp, -jnp.inf, lax.max, (3, 3, 3), (1, 1, 1), "SAME")

    cand_s, cand_r, cand_c, cand_ok = [], [], [], []
    for z, mb in enumerate(mborders):
        k = 2 * z + 1
        hc = max(0, (oh - 2 * mb - 1) // 2 + 1)
        wc = max(0, (ow - 2 * mb - 1) // 2 + 1)
        if hc == 0 or wc == 0:
            continue
        cells = jnp.stack([
            resp[k + ds, mb + di: mb + di + 2 * hc: 2,
                 mb + dj: mb + dj + 2 * wc: 2]
            for ds in (0, 1) for di in (0, 1) for dj in (0, 1)
        ])  # (8, hc, wc) in the reference's `cas` comparison order
        best = cells.max(0)
        cas = jnp.argmax(cells, axis=0).astype(jnp.int32)
        i_grid = mb + 2 * jnp.arange(hc, dtype=jnp.int32)[:, None]
        j_grid = mb + 2 * jnp.arange(wc, dtype=jnp.int32)[None, :]
        bs = k + cas // 4
        br = i_grid + (cas // 2) % 2
        bc = j_grid + cas % 2
        ok = best >= jnp.float32(0.8) * jnp.float32(cfg.thresh)
        if k + 1 == cfg.max_scale - 1:
            ok &= cas <= 3  # top scale layer has no s+1 plane (surfd.cu:737)
        ok &= best >= nbhd_max[bs, br, bc]
        cand_s.append(bs.ravel())
        cand_r.append(br.ravel())
        cand_c.append(bc.ravel())
        cand_ok.append(ok.ravel())

    cap = cfg.candidates_per_octave
    if not cand_s:
        z32 = jnp.zeros((cap,), jnp.int32)
        zf = jnp.zeros((cap,), jnp.float32)
        return dict(valid=jnp.zeros((cap,), bool), nx=zf, ny=zf, ns=zf,
                    strength=zf)
    mask = jnp.concatenate(cand_ok)
    _, valid, s0, r0, c0 = compact(
        mask, cap, jnp.concatenate(cand_s), jnp.concatenate(cand_r),
        jnp.concatenate(cand_c))

    # --- interpolation walk (vmapped, fixed iterations) ------------------
    def interp_one(s, r, c):
        def fit(r, c):
            block = lax.dynamic_slice(resp, (s - 1, r - 1, c - 1), (3, 3, 3))
            return _fit_quadrat(block)

        off = jnp.zeros(3, jnp.float32)
        strength = jnp.float32(0.0)
        active = jnp.bool_(True)
        r_fit, c_fit = r, c  # position of the last performed fit
        for _ in range(cfg.interp_moves):
            off_new, strength_new = fit(r, c)
            off = jnp.where(active, off_new, off)
            strength = jnp.where(active, strength_new, strength)
            r_fit = jnp.where(active, r, r_fit)
            c_fit = jnp.where(active, c, c_fit)
            b = borders[s]
            nr = r + jnp.where(active & (off_new[1] > 0.6) & (r < oh - b), 1, 0) \
                   - jnp.where(active & (off_new[1] < -0.6) & (r > b), 1, 0)
            nc = c + jnp.where(active & (off_new[2] > 0.6) & (c < ow - b), 1, 0) \
                   - jnp.where(active & (off_new[2] < -0.6) & (c > b), 1, 0)
            active = active & ((nr != r) | (nc != c))
            r, c = nr, nc
        return off, strength, r_fit, c_fit

    off, strength, r_fin, c_fin = jax.vmap(interp_one)(s0, r0, c0)
    good = valid
    good &= ~jnp.any(jnp.isnan(off), axis=1)
    good &= ~jnp.any(jnp.abs(off) > 1.5, axis=1)
    good &= strength >= jnp.float32(cfg.thresh)

    octave = jnp.float32(osched.octave)
    ns = (jnp.float32(cfg.init_lobe)
          + jnp.float32((osched.octave - 1) * cfg.max_scale)
          + (s0.astype(jnp.float32) + off[:, 0]) * 2.0 * octave) / jnp.float32(3.0)
    ny = octave * (r_fin.astype(jnp.float32) + off[:, 1])
    nx = octave * (c_fin.astype(jnp.float32) + off[:, 2])
    return dict(valid=good, nx=nx, ny=ny, ns=ns, strength=strength)
