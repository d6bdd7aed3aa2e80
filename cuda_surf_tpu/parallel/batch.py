"""Data-parallel frame-batch frontend.

The reference processes one frame per call on one device; the TPU build
scales frontend throughput by sharding a frame batch across the device
mesh (BASELINE.md: "frames sharded across chips for throughput").  The
per-frame pipeline is pure, so data parallelism is one `jax.vmap` under
a sharding constraint — XLA partitions the whole program with zero
cross-device communication (each chip runs its frames end to end).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SurfConfig
from ..frontend import detect_and_compute
from ..ops.matcher import match_keypoints
from .mesh import make_mesh, frame_sharding


class BatchSurf:
    """Batched SURF frontend over a device mesh.

    detect_and_compute takes (B, H, W) uint8 with B a multiple of the
    mesh size and returns batched Keypoints / (B, max_pts, nfeatures)
    descriptors, sharded over the frame axis.
    """

    def __init__(self, cfg: SurfConfig | None = None, mesh=None, **kw):
        self.cfg = cfg if cfg is not None else SurfConfig(**kw)
        self.mesh = mesh if mesh is not None else make_mesh()
        sh = frame_sharding(self.mesh)

        @jax.jit
        def _detect(images):
            images = jax.lax.with_sharding_constraint(images, sh)
            return jax.vmap(lambda im: detect_and_compute(im, self.cfg))(
                images)

        @jax.jit
        def _match(kp1, d1, kp2, d2):
            return jax.vmap(match_keypoints)(kp1, d1, kp2, d2)

        self._detect = _detect
        self._match = _match

    def detect_and_compute(self, images):
        images = jnp.asarray(images, jnp.uint8)
        if images.shape[0] % self.mesh.size:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by mesh size "
                f"{self.mesh.size}")
        return self._detect(images)

    def match(self, kp1, d1, kp2, d2):
        """Batched one-directional matching of corresponding frame pairs."""
        return self._match(kp1, d1, kp2, d2)
