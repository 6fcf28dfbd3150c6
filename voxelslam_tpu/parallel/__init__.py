from . import dist_gba, multihost

__all__ = ["dist_gba", "multihost"]
