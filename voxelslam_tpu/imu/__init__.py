from . import preintegration, ekf
from .preintegration import Preint
from .ekf import ImuPoses

__all__ = ["preintegration", "ekf", "Preint", "ImuPoses"]
