"""Profile the steady-state scan step on the current JAX backend.

Breaks one scan into: host prep, device dispatch+execute (megastep),
and stats fetch. Also times raw repeated megastep executions with
pre-staged device inputs to isolate pure device time from tunnel
latency.

Usage: python tools/profile_scan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def enable_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    enable_cache()
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    n_scans = 26
    warm = 16

    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3, ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=False)

    packets = []
    t = 0.1
    for k in range(n_scans):
        scan = sim.lidar_scan(traj, t, t + 0.1, normals, dsp,
                              n_az=160, n_el=24, noise=0.01, seed=k)
        hit = scan["hit"]
        ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
        gyr = np.empty((len(ts), 3))
        acc = np.empty((len(ts), 3))
        for i, ti in enumerate(ts):
            gyr[i], acc[i] = traj.imu_at(ti)
        packets.append((scan["points"][hit], scan["offsets"][hit],
                        ts, gyr, acc, t, t + 0.1))
        t += 0.1

    t0 = time.time()
    for k, pkt in enumerate(packets[:warm]):
        pipe.process_scan(*pkt)
    print(f"warm ({warm} scans incl compiles): {time.time()-t0:.1f}s",
          flush=True)

    # full process_scan timing
    ts_full = []
    for pkt in packets[warm:]:
        t0 = time.time()
        pipe.process_scan(*pkt)
        ts_full.append(time.time() - t0)
    print(f"process_scan: mean {np.mean(ts_full)*1e3:.1f} ms  "
          f"min {np.min(ts_full)*1e3:.1f}  max {np.max(ts_full)*1e3:.1f}",
          flush=True)

    # raw megastep: stage inputs once, run repeatedly
    pkt = packets[-1]
    pts_j, off_j, pmask = pipe._pad_points(pkt[0], pkt[1])
    ts_j, gyr_j, acc_j, imask = pipe._pad_imu(pkt[2], pkt[3], pkt[4])
    imu_blob = jnp.array(np.concatenate(
        [ts_j[:, None], gyr_j, acc_j, imask[:, None]], axis=1,
        dtype=np.float32))
    scan_blob = jnp.array(np.concatenate(
        [pts_j, off_j[:, None], pmask[:, None]], axis=1, dtype=np.float32))
    scal = jnp.array([pkt[5], pkt[6], pkt[5] - 0.1, pipe.jour], jnp.float32)

    # NOTE: megastep donates levels/win/preints, so re-feed outputs
    args = (pipe.x, pipe.levels, pipe.win, pipe.mp, pipe.preints_dev,
            imu_blob, scan_blob, scal)
    outs = pipe._jit_megastep(*args)
    jax.block_until_ready(outs)
    reps = 10
    t0 = time.time()
    x, levels, win, mp, preints = outs[0], outs[1], outs[2], outs[3], outs[4]
    for _ in range(reps):
        outs = pipe._jit_megastep(x, levels, win, mp, preints,
                                  imu_blob, scan_blob, scal)
        x, levels, win, mp, preints = (outs[0], outs[1], outs[2], outs[3],
                                       outs[4])
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / reps
    print(f"raw megastep (pipelined x{reps}): {dt*1e3:.1f} ms", flush=True)

    # single blocking megastep (includes one dispatch round trip)
    t0 = time.time()
    outs = pipe._jit_megastep(x, levels, win, mp, preints,
                              imu_blob, scan_blob, scal)
    jax.block_until_ready(outs)
    print(f"raw megastep (blocking x1): {(time.time()-t0)*1e3:.1f} ms",
          flush=True)

    # host->device transfer cost
    t0 = time.time()
    for _ in range(reps):
        a = jnp.array(np.concatenate(
            [pts_j, off_j[:, None], pmask[:, None]], axis=1,
            dtype=np.float32))
        jax.block_until_ready(a)
    print(f"h2d scan blob: {(time.time()-t0)/reps*1e3:.1f} ms", flush=True)

    # stats fetch cost
    stats = outs[5]
    t0 = time.time()
    for _ in range(reps):
        np.asarray(stats)
    print(f"d2h stats: {(time.time()-t0)/reps*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
