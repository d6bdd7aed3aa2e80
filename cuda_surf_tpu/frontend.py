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
from .ops.integral import integral_image, box_sum
from .ops.hessian import response_pyramid
from .ops.extrema import detect
from .ops.fused_detect import fused_pyramid, use_fused
from .ops.orientation import assign_orientations
from .ops.descriptor import describe
from .ops.matcher import match_keypoints


def detect_and_compute(image: jnp.ndarray, cfg: SurfConfig,
                       compute_descriptors: bool = True):
    """uint8 (H, W) -> (Keypoints, (max_pts, nfeatures) descriptors).

    Pipeline mirror of Surfor::detectAndCompute (surf.cpp:205-355):
    integral image -> per-octave response maps (with cross-octave
    decimation reuse) -> fused NMS+interp -> orientation (unless upright)
    -> descriptors -> L2 normalize.
    """
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

    cand = detect(pyr, sched, cfg, cand_masks=cand_masks)
    count, valid, nx, ny, ns, strength, octave = compact(
        cand["valid"], cfg.max_pts, cand["nx"], cand["ny"], cand["ns"],
        cand["strength"], cand["octave"])

    # makePoint (surfd.cu:1001-1022): scale octave-space coords to image
    # space and compute the Laplacian sign on the integral image.
    td = jnp.float32(cfg.sampling * cfg.divisor)
    x = nx * td
    y = ny * td
    scale = jnp.float32(1.2) * ns * jnp.float32(cfg.divisor)
    temp = jnp.trunc(jnp.float32(3.0) * ns + jnp.float32(0.5)).astype(jnp.int32)
    cx = jnp.trunc(nx * jnp.float32(cfg.sampling) + jnp.float32(0.5)).astype(jnp.int32)
    cy = jnp.trunc(ny * jnp.float32(cfg.sampling) + jnp.float32(0.5)).astype(jnp.int32)
    x2 = temp // 2
    x3 = 2 * x2
    lxx = (box_sum(ii, cx + temp + x2, cy + x3, cx - temp - x2, cy - x3)
           - 3 * box_sum(ii, cx + x2, cy + x3, cx - x2, cy - x3))
    lyy = (box_sum(ii, cx + x3, cy + temp + x2, cx - x3, cy - temp - x2)
           - 3 * box_sum(ii, cx + x3, cy + x2, cx - x3, cy - x2))
    laplace = jnp.where(lxx + lyy > 0, 1, -1).astype(jnp.int32)

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
