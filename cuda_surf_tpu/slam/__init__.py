from .tracking import Intrinsics, default_intrinsics, track_pair, TrackResult
from .posegraph import PoseGraph, optimize as optimize_pose_graph
from .pipeline import SlamPipeline, FrameState
from .evaluate import ate_rmse, umeyama_align
from .checkpoint import save_pipeline, load_pipeline
from .sequence import (render_plane_sequence, run_sequence, SequenceResult,
                       load_image_dir, load_tum_trajectory,
                       load_kitti_poses, load_kitti_calib,
                       load_kitti_times, associate_timestamps)
from .loopclosure import LoopDetector, LoopClosure, optimize_with_loops

__all__ = [
    "Intrinsics", "default_intrinsics", "track_pair", "TrackResult",
    "PoseGraph", "optimize_pose_graph", "SlamPipeline", "FrameState",
    "ate_rmse", "umeyama_align", "save_pipeline", "load_pipeline",
    "render_plane_sequence", "run_sequence", "SequenceResult",
    "load_image_dir", "load_tum_trajectory", "associate_timestamps",
    "load_kitti_poses", "load_kitti_calib", "load_kitti_times",
    "LoopDetector", "LoopClosure", "optimize_with_loops",
]
