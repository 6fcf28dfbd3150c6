from . import btc, icp, posegraph  # noqa: F401
