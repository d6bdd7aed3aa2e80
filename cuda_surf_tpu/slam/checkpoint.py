"""Checkpoint / resume for long SLAM runs.

The reference pipeline is stateless between frames and has no
checkpointing (SURVEY.md section 5); the SLAM layer adds long-running
state (trajectory, keyframes, previous-frame features, RNG key) that
must survive restarts.  Serialization is a plain .npz archive — pytrees
of ndarrays plus a small JSON header — no extra dependencies.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Keypoints
from .pipeline import FrameState, SlamPipeline

_FORMAT_VERSION = 1


def save_pipeline(path: str, pipe: SlamPipeline) -> None:
    """Write the pipeline's resumable state to `path` (.npz)."""
    arrays = {}
    header = {
        "version": _FORMAT_VERSION,
        "n_frames": len(pipe.frames),
        "has_prev": pipe._prev is not None,
        "prev_depth": pipe._prev_depth,
        "intrinsics": list(pipe.intr) if pipe.intr is not None else None,
    }
    if pipe.frames:
        arrays["frame_R"] = np.stack([f.R for f in pipe.frames])
        arrays["frame_t"] = np.stack([f.t for f in pipe.frames])
        arrays["frame_meta"] = np.asarray(
            [[f.index, f.n_inliers, int(f.is_keyframe)] for f in pipe.frames],
            np.int64)
    arrays["rng_key"] = np.asarray(pipe.key)  # legacy uint32 PRNG key
    if pipe._prev is not None:
        kps, desc = pipe._prev
        leaves, _ = jax.tree_util.tree_flatten(kps)
        for i, leaf in enumerate(leaves):
            arrays[f"prev_kp_{i}"] = np.asarray(leaf)
        arrays["prev_desc"] = np.asarray(desc)
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pipeline(path: str, pipe: SlamPipeline) -> SlamPipeline:
    """Restore state saved by :func:`save_pipeline` into `pipe`
    (which must have been constructed with the same config)."""
    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    if header["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {header['version']} "
                         f"!= {_FORMAT_VERSION}")
    pipe.reset()
    if header["intrinsics"] is not None:
        from .tracking import Intrinsics
        pipe.intr = Intrinsics(*header["intrinsics"])
    if header["n_frames"]:
        meta = data["frame_meta"]
        for k in range(header["n_frames"]):
            pipe.frames.append(FrameState(
                index=int(meta[k, 0]), R=data["frame_R"][k],
                t=data["frame_t"][k], n_inliers=int(meta[k, 1]),
                is_keyframe=bool(meta[k, 2])))
    pipe.key = jnp.asarray(data["rng_key"])
    pipe._prev_depth = header["prev_depth"]
    if header["has_prev"]:
        n = 0
        leaves = []
        while f"prev_kp_{n}" in data:
            leaves.append(jnp.asarray(data[f"prev_kp_{n}"]))
            n += 1
        treedef = jax.tree_util.tree_structure(Keypoints.empty(1))
        kps = jax.tree_util.tree_unflatten(treedef, leaves)
        pipe._prev = (kps, jnp.asarray(data["prev_desc"]))
    return pipe
