from .mesh import make_mesh, frame_sharding, replicated
from .batch import BatchSurf
from .multihost import (initialize_from_env, multiprocess_env,
                        global_mesh, global_batch)
from .elastic import CheckpointDir, Heartbeat, run_elastic

__all__ = ["make_mesh", "frame_sharding", "replicated", "BatchSurf",
           "initialize_from_env", "multiprocess_env", "global_mesh",
           "global_batch", "CheckpointDir", "Heartbeat", "run_elastic"]
