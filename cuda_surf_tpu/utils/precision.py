"""Matmul-precision control.

On TPU, float32 matmuls default to bfloat16 MXU passes — right for the
big descriptor/matcher contractions, wrong for small geometry linear
algebra (rotation composition, normal equations) where bf16 rounding is
a 0.5% relative error.  Decorate accuracy-critical functions so every
dot/einsum they trace uses full float32 precision.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Run fn under `jax.default_matmul_precision('float32')`."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped
