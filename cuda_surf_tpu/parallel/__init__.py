from .mesh import make_mesh, frame_sharding, replicated

__all__ = ["make_mesh", "frame_sharding", "replicated"]
