from . import dist_gba

__all__ = ["dist_gba"]
