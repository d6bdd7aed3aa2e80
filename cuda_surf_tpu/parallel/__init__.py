from .mesh import make_mesh, frame_sharding, replicated
from .batch import BatchSurf

__all__ = ["make_mesh", "frame_sharding", "replicated", "BatchSurf"]
