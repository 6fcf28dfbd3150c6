from .hba import HbaRunner  # noqa: F401
