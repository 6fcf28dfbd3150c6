"""Time the fused steady-state megastep (ms/scan) on the current backend.

Usage: python tools/time_megastep.py [n_iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_megastep import enable_cache, build_warm_pipeline  # noqa: E402


def main():
    enable_cache()
    import jax

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    pipe, blobs = build_warm_pipeline()
    imu_blob, scan_blob, scal = blobs
    outs = pipe._jit_megastep(pipe.x, pipe.levels, pipe.win, pipe.mp,
                              pipe.preints_dev, pipe._stats_ring,
                              imu_blob, scan_blob, scal)
    jax.block_until_ready(outs)
    x, levels, win, mp, preints, ring = outs[:6]
    t0 = time.time()
    for _ in range(n):
        outs = pipe._jit_megastep(x, levels, win, mp, preints, ring,
                                  imu_blob, scan_blob, scal)
        x, levels, win, mp, preints, ring = outs[:6]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n
    print(f"megastep: {dt*1e3:.2f} ms/scan  ({1.0/dt:.2f} fps)", flush=True)


if __name__ == "__main__":
    main()
