from . import metrics
from . import checkpoint

__all__ = ["metrics"]
