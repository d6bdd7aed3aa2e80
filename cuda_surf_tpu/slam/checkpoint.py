"""Checkpoint / resume for long SLAM runs.

The reference pipeline is stateless between frames and has no
checkpointing (SURVEY.md section 5); the SLAM layer adds long-running
state (trajectory, keyframes, previous-frame features, RNG key, loop
closures, landmark tracks) that must survive restarts.  Serialization is
a plain .npz archive — pytrees of ndarrays plus a small JSON header — no
extra dependencies.

Resume is complete: the keyframe map (windowed BA), the loop detector's
per-frame feature store, detected loop edges and the per-frame depth
record are all round-tripped, so a restored pipeline continues
bit-identically in every pipeline mode (plain VO, window_ba,
loop_detect).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Keypoints
from .loopclosure import LoopClosure
from .pipeline import FrameState, SlamPipeline

_FORMAT_VERSION = 3


def _kp_treedef():
    return jax.tree_util.tree_structure(Keypoints.empty(1))


def save_pipeline(path: str, pipe: SlamPipeline) -> None:
    """Write the pipeline's resumable state to `path` (.npz)."""
    arrays = {}
    header = {
        "version": _FORMAT_VERSION,
        "n_frames": len(pipe.frames),
        "has_prev": pipe._prev is not None,
        "prev_depth": pipe._prev_depth,
        "intrinsics": list(pipe.intr) if pipe.intr is not None else None,
        "n_loops": len(pipe.loops),
        "has_map": pipe.map is not None,
        "has_detector": pipe._detector is not None,
    }
    if pipe.frames:
        arrays["frame_R"] = np.stack([f.R for f in pipe.frames])
        arrays["frame_t"] = np.stack([f.t for f in pipe.frames])
        arrays["frame_meta"] = np.asarray(
            [[f.index, f.n_inliers, int(f.is_keyframe)] for f in pipe.frames],
            np.int64)
    arrays["rng_key"] = np.asarray(pipe.key)  # legacy uint32 PRNG key
    arrays["frame_depths"] = np.asarray(pipe.frame_depths, np.float64)
    if pipe._prev_kp_depth is not None:
        arrays["prev_kp_depth"] = np.asarray(pipe._prev_kp_depth,
                                             np.float64)
    if pipe._prev is not None:
        kps, desc = pipe._prev
        leaves, _ = jax.tree_util.tree_flatten(kps)
        for i, leaf in enumerate(leaves):
            arrays[f"prev_kp_{i}"] = np.asarray(leaf)
        arrays["prev_desc"] = np.asarray(desc)
    if pipe.loops:
        arrays["loop_ij_n"] = np.asarray(
            [[lc.i, lc.j, lc.n_inliers] for lc in pipe.loops], np.int64)
        arrays["loop_R"] = np.stack([lc.R for lc in pipe.loops])
        arrays["loop_t"] = np.stack([lc.t for lc in pipe.loops])
        arrays["loop_depth"] = np.asarray(
            [lc.med_depth for lc in pipe.loops], np.float64)
        arrays["loop_depth_j"] = np.asarray(
            [lc.med_depth_j for lc in pipe.loops], np.float64)
    if pipe.map is not None:
        m = pipe.map
        header["map_next_track"] = m._next_track
        header["map_n_keyframes"] = len(m.keyframes)
        if m.keyframes:
            arrays["map_R"] = np.stack([kf.R for kf in m.keyframes])
            arrays["map_t"] = np.stack([kf.t for kf in m.keyframes])
            arrays["map_xy"] = np.stack([kf.xy for kf in m.keyframes])
            arrays["map_valid"] = np.stack([kf.valid for kf in m.keyframes])
            arrays["map_tid"] = np.stack(
                [kf.track_id for kf in m.keyframes])
            arrays["map_index"] = np.asarray(
                [kf.index for kf in m.keyframes], np.int64)
    if pipe._detector is not None:
        det = pipe._detector
        header["det_n_frames"] = len(det._frames)
        header["det_max_store"] = det.max_store
        arrays["det_key"] = np.asarray(det.key)
        if det._sigs:
            # signatures for every frame (O(F x nfeatures)); full
            # features only for frames still in the (possibly ring-
            # capped) store
            arrays["det_sigs"] = np.stack(det._sigs)
        retained = [f for f, v in enumerate(det._frames) if v is not None]
        header["det_retained"] = retained
        n_leaves = 0
        for f in retained:
            kps, desc = det._frames[f]
            leaves, _ = jax.tree_util.tree_flatten(kps)
            n_leaves = len(leaves)
            for i, leaf in enumerate(leaves):
                arrays[f"det_kp_{f}_{i}"] = np.asarray(leaf)
            arrays[f"det_desc_{f}"] = np.asarray(desc)
        header["det_n_leaves"] = n_leaves
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_pipeline(path: str, pipe: SlamPipeline) -> SlamPipeline:
    """Restore state saved by :func:`save_pipeline` into `pipe`
    (which must have been constructed with the same config)."""
    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    if header["version"] > _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {header['version']} "
                         f"> {_FORMAT_VERSION}")
    # Version 2 introduced the window_ba/loop_detect state; later versions
    # only add optional fields with load-time fallbacks (e.g. v3's
    # det_retained ring-cap bookkeeping), so any >= 2 checkpoint restores.
    if header["version"] < 2 and (pipe.window_ba or pipe.loop_detect):
        raise ValueError(
            "version-1 checkpoint cannot restore window_ba/loop_detect "
            "state; re-save with the current format or resume a plain-VO "
            "pipeline")
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
    if "frame_depths" in data:
        pipe.frame_depths = [float(d) for d in data["frame_depths"]]
    if "prev_kp_depth" in data:
        pipe._prev_kp_depth = data["prev_kp_depth"]
    treedef = _kp_treedef()
    if header["has_prev"]:
        n = 0
        leaves = []
        while f"prev_kp_{n}" in data:
            leaves.append(jnp.asarray(data[f"prev_kp_{n}"]))
            n += 1
        kps = jax.tree_util.tree_unflatten(treedef, leaves)
        pipe._prev = (kps, jnp.asarray(data["prev_desc"]))
    for k in range(header.get("n_loops", 0)):
        ijn = data["loop_ij_n"][k]
        dj = (float(data["loop_depth_j"][k]) if "loop_depth_j" in data
              else 0.0)  # pre-field checkpoints: sim3 falls back to med_i
        pipe.loops.append(LoopClosure(
            i=int(ijn[0]), j=int(ijn[1]), R=data["loop_R"][k],
            t=data["loop_t"][k], n_inliers=int(ijn[2]),
            med_depth=float(data["loop_depth"][k]), med_depth_j=dj))
    if header.get("has_map"):
        from .mapping import Keyframe, KeyframeMap
        pipe.map = KeyframeMap(pipe.intr, window=pipe.window_ba or 5)
        pipe.map._next_track = header["map_next_track"]
        for k in range(header.get("map_n_keyframes", 0)):
            pipe.map.keyframes.append(Keyframe(
                index=int(data["map_index"][k]), R=data["map_R"][k],
                t=data["map_t"][k], xy=data["map_xy"][k],
                valid=data["map_valid"][k],
                track_id=data["map_tid"][k].copy()))
    if header.get("has_detector"):
        from .loopclosure import LoopDetector
        det = LoopDetector(pipe.intr, min_gap=pipe.loop_min_gap,
                           max_store=header.get("det_max_store"))
        pipe._detector = det
        det.key = jnp.asarray(data["det_key"])
        n_leaves = header.get("det_n_leaves", 0)
        n_frames = header.get("det_n_frames", 0)
        retained = header.get("det_retained")  # absent in version <= 2
        if retained is None:
            retained = list(range(n_frames))
        retained = set(retained)
        for f in range(n_frames):
            if f in retained:
                leaves = [np.asarray(data[f"det_kp_{f}_{i}"])
                          for i in range(n_leaves)]
                kps = jax.tree_util.tree_unflatten(treedef, leaves)
                det._frames.append((kps, np.asarray(data[f"det_desc_{f}"])))
                det._sigs.append(det._signature(kps, det._frames[-1][1]))
            else:
                det._frames.append(None)
                det._sigs.append(None)
        if "det_sigs" in data:  # authoritative (covers evicted frames)
            det._sigs = [np.asarray(s) for s in data["det_sigs"]]
    return pipe
