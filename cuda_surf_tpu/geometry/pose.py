"""SO(3)/SE(3) utilities for the SfM/SLAM backend.

New capability (no reference counterpart -- the CUDA reference is a
feature frontend only, SURVEY.md section 1).  Everything is batched,
jit-friendly, float32-first.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.precision import f32_matmuls


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


@f32_matmuls
def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: axis-angle (..., 3) -> rotation (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    theta = jnp.maximum(theta, 1e-12)
    K = hat(w / theta[..., 0])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = eye + s * K + (1.0 - c) * (K @ K)
    small = theta[..., 0, 0][..., None, None] < 1e-7
    return jnp.where(small, eye + hat(w), R)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation (..., 3, 3) -> axis-angle (..., 3)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    s = jnp.sin(theta)[..., None]
    factor = jnp.where(jnp.abs(s) < 1e-7, 0.5, theta[..., None] / (2 * jnp.maximum(jnp.abs(s), 1e-12)) * jnp.sign(s))
    return v * factor


@f32_matmuls
def exp_se3(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Twist (..., 6) [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    theta = jnp.maximum(theta, 1e-12)
    K = hat(phi / theta[..., 0])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    V = eye + ((1 - c) / theta) * K + ((theta - s) / theta) * (K @ K)
    small = theta[..., 0, 0][..., None, None] < 1e-7
    V = jnp.where(small, eye, V)
    t = (V @ rho[..., None])[..., 0]
    return R, t


@f32_matmuls
def compose(Ra, ta, Rb, tb):
    """(Ra, ta) * (Rb, tb): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def invert(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


@f32_matmuls
def transform(R, t, pts):
    """Apply (R, t) to (..., N, 3) points."""
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
