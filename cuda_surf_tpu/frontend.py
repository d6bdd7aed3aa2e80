"""SURF frontend pipeline driver.

TPU-native equivalent of surf::Surfor (surf.cpp:60-428): owns nothing —
the pipeline is a pure jitted function of (image, static config).  The
reference's buffer caching (imem/omem reuse, surf.cpp:222-231) is
subsumed by XLA's compilation cache + buffer donation; its constant-memory
uploads are compile-time constants baked in through `SurfConfig`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .config import SurfConfig
from .types import Keypoints, Matches, compact
from .ops.integral import integral_image
from .ops.hessian import response_pyramid
from .ops.extrema import detect
from .ops.fused_detect import fused_pyramid, use_fused
from .ops.orientation import assign_orientations
from .ops.descriptor import describe
from .ops.matcher import match_keypoints


def _detect_frame(image: jnp.ndarray, cfg: SurfConfig):
    """integral image + pyramid + NMS/interp candidates for one frame."""
    h, w = image.shape
    ii = integral_image(image, cfg.doubled)
    sched = cfg.hessian_schedule(h, w)

    if use_fused(cfg):
        pyr, cand_masks = fused_pyramid(
            image, cfg, h, w,
            interpret=cfg.detect_backend == "fused_interpret")
    else:
        pyr = response_pyramid(ii, cfg, h, w, img=image)
        cand_masks = None
    return ii, pyr, cand_masks, sched


def _make_keypoints(ii, cand, cfg: SurfConfig):
    """Compaction + makePoint (surfd.cu:1001-1022): scale octave-space
    coords to image space, Laplacian sign on the integral image."""
    count, valid, nx, ny, ns, strength, octave = compact(
        cand["valid"], cfg.max_pts, cand["nx"], cand["ny"], cand["ns"],
        cand["strength"], cand["octave"])

    td = jnp.float32(cfg.sampling * cfg.divisor)
    x = nx * td
    y = ny * td
    scale = jnp.float32(1.2) * ns * jnp.float32(cfg.divisor)
    temp = jnp.trunc(jnp.float32(3.0) * ns + jnp.float32(0.5)).astype(jnp.int32)
    cx = jnp.trunc(nx * jnp.float32(cfg.sampling) + jnp.float32(0.5)).astype(jnp.int32)
    cy = jnp.trunc(ny * jnp.float32(cfg.sampling) + jnp.float32(0.5)).astype(jnp.int32)
    x2 = temp // 2
    x3 = 2 * x2

    # The four Laplacian box sums are 16 integral-image corner reads; a
    # box_sum() call per box costs 4 separate gather kernels on TPU, so
    # all corners gather in ONE flat take (bit-identical: per-axis index
    # clamping replicated, int32 adds reassociate exactly).
    ih_i, iw_i = ii.shape
    iif = ii.reshape(-1)

    def corner(xx, yy):
        # replicate jnp advanced-indexing semantics exactly: negative
        # indices wrap once, then clamp to the valid range
        xx = jnp.clip(jnp.where(xx < 0, xx + iw_i, xx), 0, iw_i - 1)
        yy = jnp.clip(jnp.where(yy < 0, yy + ih_i, yy), 0, ih_i - 1)
        return yy * iw_i + xx

    def box_corners(x1, y1, x2_, y2_):
        # getSum corners (surfd.cu:334-343): +(y1+1,x1+1) +(y2,x2)
        # -(y2,x1+1) -(y1+1,x2)
        return [corner(x1 + 1, y1 + 1), corner(x2_, y2_),
                corner(x1 + 1, y2_), corner(x2_, y1 + 1)]

    boxes = (box_corners(cx + temp + x2, cy + x3, cx - temp - x2, cy - x3)
             + box_corners(cx + x2, cy + x3, cx - x2, cy - x3)
             + box_corners(cx + x3, cy + temp + x2, cx - x3, cy - temp - x2)
             + box_corners(cx + x3, cy + x2, cx - x3, cy - x2))
    vals = jnp.take(iif, jnp.stack(boxes).reshape(-1)).reshape(16, -1)
    b = vals[0::4] + vals[1::4] - vals[2::4] - vals[3::4]   # (4, K)
    lxx = b[0] - 3 * b[1]
    lyy = b[2] - 3 * b[3]
    laplace = jnp.where(lxx + lyy > 0, 1, -1).astype(jnp.int32)
    return count, valid, x, y, scale, strength, laplace, octave


def detect_and_compute(image: jnp.ndarray, cfg: SurfConfig,
                       compute_descriptors: bool = True):
    """uint8 (H, W) -> (Keypoints, (max_pts, nfeatures) descriptors).

    Pipeline mirror of Surfor::detectAndCompute (surf.cpp:205-355):
    integral image -> per-octave response maps (with cross-octave
    decimation reuse) -> fused NMS+interp -> orientation (unless upright)
    -> descriptors -> L2 normalize.
    """
    ii, pyr, cand_masks, sched = _detect_frame(image, cfg)
    cand = detect(pyr, sched, cfg, cand_masks=cand_masks)
    count, valid, x, y, scale, strength, laplace, octave = \
        _make_keypoints(ii, cand, cfg)

    ori = jnp.zeros_like(x)
    if compute_descriptors and not cfg.upright:
        ori = assign_orientations(ii, cfg, x, y, scale, valid)
        ori = jnp.where(valid, ori, 0.0)

    kps = Keypoints(x=x, y=y, scale=scale, strength=strength,
                    laplace=laplace, ori=ori, octave=octave,
                    valid=valid, count=count)
    if not compute_descriptors:
        return kps, jnp.zeros((cfg.max_pts, cfg.nfeatures), jnp.float32)
    desc = describe(ii, cfg, x, y, scale, ori, valid)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return kps, desc


def detect_and_compute_batch(images: jnp.ndarray, cfg: SurfConfig,
                             compute_descriptors: bool = True):
    """uint8 (B, H, W) -> (Keypoints with (B, max_pts) fields,
    (B, max_pts, nfeatures) descriptors) — the throughput formulation
    of the pipeline (BASELINE.md's frames/sec/chip metric).

    Where the single-frame pipeline's per-frame stages are fixed-
    overhead bound (candidate compaction, subpixel walk, makePoint run
    dozens of small XLA kernels on (cap,) vectors), the batch runs them
    ONCE over (B, ...) arrays via vmap; the descriptor stage runs all
    B frames' keypoints through one set of Pallas calls over the B
    frames' integral images stacked vertically at 32-aligned slab
    offsets (frame-local border semantics preserved via per-keypoint
    row bases).  The Pallas pyramid kernels stay per-frame inside the
    one jitted program (their cost is area-proportional, not
    overhead-bound).

    Rotated mode (upright=False) falls back to lax.map of the
    single-frame pipeline (the orientation stage is not yet
    frame-stacked).
    """
    B, h, w = images.shape
    if not cfg.upright and compute_descriptors:
        return jax.lax.map(
            lambda im: detect_and_compute(im, cfg, compute_descriptors),
            images)

    iis, pyrs, masks = [], [], []
    for f in range(B):  # Pallas pyramid: per-frame calls, one program
        ii_f, pyr_f, m_f, sched = _detect_frame(images[f], cfg)
        iis.append(ii_f)
        pyrs.append(pyr_f)
        masks.append(m_f)
    ii = jnp.stack(iis)
    noct = cfg.noctaves
    pyr_b = [jnp.stack([pyrs[f][o] for f in range(B)])
             for o in range(noct)]
    if masks[0] is not None:
        mask_b = [jnp.stack([masks[f][o] for f in range(B)])
                  for o in range(noct)]
        cand = jax.vmap(
            lambda p, m: detect(p, sched, cfg, cand_masks=m))(pyr_b, mask_b)
    else:
        cand = jax.vmap(lambda p: detect(p, sched, cfg))(pyr_b)

    count, valid, x, y, scale, strength, laplace, octave = jax.vmap(
        lambda i2, c: _make_keypoints(i2, c, cfg))(ii, cand)

    kps = Keypoints(x=x, y=y, scale=scale, strength=strength,
                    laplace=laplace, ori=jnp.zeros_like(x), octave=octave,
                    valid=valid, count=count)
    if not compute_descriptors:
        return kps, jnp.zeros((B, cfg.max_pts, cfg.nfeatures), jnp.float32)

    # frame-stacked describe: the group's keypoints in one kernel set.
    # Groups are capped so the supertile kernel's (K, 128) VMEM output
    # block stays within budget (~8K keypoint rows = 4 MB).
    ih, iw = ii.shape[1], ii.shape[2]
    hs = -(-ih // 32) * 32  # 32-aligned slab stride (resident row tile)
    gf = max(1, 8192 // cfg.max_pts)
    descs = []
    for g0 in range(0, B, gf):
        gb = min(gf, B - g0)
        ii_stack = jnp.pad(ii[g0:g0 + gb],
                           ((0, 0), (0, hs - ih), (0, 0))).reshape(
            gb * hs, iw)
        row_base = jnp.repeat(
            jnp.arange(gb, dtype=jnp.int32) * hs, cfg.max_pts)
        flat = lambda a: a[g0:g0 + gb].reshape(gb * cfg.max_pts)
        d = describe(ii_stack, cfg, flat(x), flat(y), flat(scale),
                     jnp.zeros((gb * cfg.max_pts,), jnp.float32),
                     flat(valid), row_base=row_base, frame_hw=(ih, iw),
                     slab=hs, nframes=gb)
        d = jnp.where(flat(valid)[:, None], d, 0.0)
        descs.append(d.reshape(gb, cfg.max_pts, cfg.nfeatures))
    return kps, jnp.concatenate(descs, axis=0)


class Surf:
    """Convenience stateful wrapper holding jitted closures per config
    (the `Surfor` role, surf.h:20-62)."""

    def __init__(self, cfg: SurfConfig | None = None, **kw):
        self.cfg = cfg if cfg is not None else SurfConfig(**kw)
        self._detect = jax.jit(
            functools.partial(detect_and_compute, cfg=self.cfg))
        self._match = jax.jit(match_keypoints)

    def detect_and_compute(self, image):
        return self._detect(jnp.asarray(image, jnp.uint8))

    def match(self, kp1, desc1, kp2, desc2) -> Matches:
        return self._match(kp1, desc1, kp2, desc2)
