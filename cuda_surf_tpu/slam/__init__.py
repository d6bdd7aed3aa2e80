from .tracking import Intrinsics, default_intrinsics, track_pair, TrackResult
from .posegraph import PoseGraph, optimize as optimize_pose_graph
from .pipeline import SlamPipeline, FrameState
from .evaluate import ate_rmse, umeyama_align

__all__ = [
    "Intrinsics", "default_intrinsics", "track_pair", "TrackResult",
    "PoseGraph", "optimize_pose_graph", "SlamPipeline", "FrameState",
    "ate_rmse", "umeyama_align",
]
