from . import voxel_hash

__all__ = ["voxel_hash"]
