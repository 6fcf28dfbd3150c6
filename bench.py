"""Benchmark: LiDAR-inertial odometry + sliding-window local BA throughput.

Runs the full per-scan pipeline (EKF+deskew, voxel downsample, iEKF
update vs the voxel map, window insert, plane refresh, LI-BA each scan
once the window is full) on simulated room scans, on the default JAX
backend (the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": "odometry+localBA frames/s/chip", "value": N,
   "unit": "frames/s", "vs_baseline": N}

Baseline: the reference is sized for 10 Hz real-time scan processing on
a multicore x86 with 5 worker threads (BASELINE.md — no published fps;
10 Hz intent from the 0.1 s scan guards). vs_baseline = fps / 10.
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the fused per-scan step is a
    large graph (~minutes to compile on a small host); cache it so
    repeated bench runs only pay execution time."""
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    _enable_compile_cache()
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    # init fills 10 scans, then 44 steady scans = 11 full K=4 batches —
    # the last scan triggers a dispatch, so nothing is left queued
    # (steady dispatch is batched odom.batch_scans scans per device call)
    n_scans = 54
    warm = 20  # include init + first BA compiles

    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3, ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=False)

    # pre-generate scans so data generation is outside the timed loop
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

    t_steady = None
    n_timed = 0
    for k, pkt in enumerate(packets):
        if k == warm:
            t_steady = time.time()
        out = pipe.process_scan(*pkt)
        if k >= warm:
            n_timed += 1
    import jax
    jax.block_until_ready(pipe.x)   # charge the final batch's device time
    elapsed = time.time() - t_steady
    fps = n_timed / elapsed

    print(json.dumps({
        "metric": "odometry+localBA frames/s/chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
