from . import so3, eig3, state, cluster
from .state import NavState, DIM, GRAVITY
from .cluster import Cluster

__all__ = ["so3", "eig3", "state", "cluster", "NavState", "Cluster", "DIM", "GRAVITY"]
