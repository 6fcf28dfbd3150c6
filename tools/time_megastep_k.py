"""Time the K-scan batched megastep (ms/scan) on the current backend.

One `_jit_megastep_k` call runs `odom.batch_scans` scans via lax.scan —
this measures the amortized per-scan wall clock (dispatch RTT / K +
device time), the number the end-to-end pipeline sees in steady state.

Usage: python tools/time_megastep_k.py [n_calls]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_megastep import enable_cache, build_warm_pipeline  # noqa: E402


def main():
    enable_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    pipe, blobs = build_warm_pipeline()
    imu_blob, scan_blob, scal = blobs
    K = max(2, pipe._batch_K)
    imu_b = jnp.stack([imu_blob] * K)
    scan_b = jnp.stack([scan_blob] * K)
    base = np.asarray(scal)
    scals = jnp.array(np.stack(
        [np.concatenate([base[:4], [float(k)]]) for k in range(K)]),
        jnp.float32)

    outs = pipe._jit_megastep_k(pipe.x, pipe.levels, pipe.win, pipe.mp,
                                pipe.preints_dev, imu_b, scan_b, scals)
    jax.block_until_ready(outs)
    x, levels, win, mp, preints = outs[:5]
    t0 = time.time()
    for _ in range(n):
        outs = pipe._jit_megastep_k(x, levels, win, mp, preints,
                                    imu_b, scan_b, scals)
        x, levels, win, mp, preints = outs[:5]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / (n * K)
    print(f"megastep_k (K={K}): {dt*1e3:.2f} ms/scan  ({1.0/dt:.2f} fps)",
          flush=True)


if __name__ == "__main__":
    main()
