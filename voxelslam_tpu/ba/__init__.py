from . import lidar_factor, optimizers
from .lidar_factor import FactorBatch

__all__ = ["lidar_factor", "optimizers", "FactorBatch"]
