"""Benchmark: LiDAR-inertial odometry + sliding-window local BA throughput.

Runs the full per-scan pipeline (EKF+deskew, voxel downsample, iEKF
update vs the voxel map, window insert, plane refresh, LI-BA each scan
once the window is full) on simulated room scans, on the default JAX
backend (the real TPU chip under the driver).

Robustness (round-4 rework): the end-to-end number is the MEDIAN of
several independently timed steady-state segments of the same packet
stream (tunnel-RTT spikes land in one segment, not the headline), every
compile — including the periodic eviction pass — is forced before the
first timed segment, and the same JSON line also reports the device-only
megastep time measured by chaining the batched steady step on device.

Prints ONE JSON line:
  {"metric": "odometry+localBA frames/s/chip", "value": N,
   "unit": "frames/s", "vs_baseline": N, "fps_runs": [...],
   "device_ms_per_scan": N}

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
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim

    # Map capacity is sized to the scene + eviction horizon like any
    # deployment config. The bench room's full surface is ~33k occupied
    # finest-level voxels (area / 0.25^2) — r4's caps ran the finest
    # table at an apparent 0.4 load only because the old degenerate
    # voxel hash silently dropped colliding keys; with the fixed hash
    # the same caps hit 0.91 load (probe-chain drops + futile eviction
    # rebuilds every 50 scans, the source of the r4 fps outlier
    # segment). (8k, 32k, 64k) holds every level at <= ~0.5 load;
    # evict_load 0.55 keeps the load-factor eviction OUT of a bench
    # whose 14 m journey can never age voxels past the 700 m horizon
    # (eviction cost is exercised by the endurance test instead).
    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 13, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192),
                      evict_load=0.55),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    warm = 22           # init (10) + 3 full K=4 steady batches
    n_seg = 3           # timed repetitions (median is the headline)
    seg = 40            # scans per segment (10 K=4 dispatches each)
    n_scans = warm + n_seg * seg

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

    # ---- warmup: init + steady compiles ----
    for pkt in packets[:warm]:
        pipe.process_scan(*pkt)
    # force the eviction-path compiles (occ-count readback + table
    # rebuild) OUTSIDE the timed region; the rebuilt levels are
    # discarded — nothing is evicted this early, it only compiles
    occ = pipe._jit_occ_counts(pipe.levels)
    lv2, _ = pipe._jit_evict(pipe.levels, jnp.float32(pipe.jour))
    jax.block_until_ready((occ, lv2))
    del lv2
    jax.block_until_ready(pipe.x)

    # ---- timed segments ----
    fps_runs = []
    k = warm
    for _ in range(n_seg):
        t0 = time.time()
        for pkt in packets[k:k + seg]:
            pipe.process_scan(*pkt)
        jax.block_until_ready(pipe.x)   # charge this segment's device time
        fps_runs.append(seg / (time.time() - t0))
        k += seg
    fps = float(np.median(fps_runs))

    # ---- device-only ms/scan: chain the batched steady megastep on
    # device, state-to-state, no host readbacks in the loop ----
    K = pipe._batch_K
    blobs = []
    for (pts, off, ts, gyr, acc, t_beg, t_end) in packets[-K:]:
        pts_j, off_j, pmask = pipe._pad_points(pts, off)
        ts_j, gyr_j, acc_j, imask = pipe._pad_imu(ts, gyr, acc)
        imu_np = np.concatenate(
            [np.asarray(ts_j)[:, None], np.asarray(gyr_j),
             np.asarray(acc_j), np.asarray(imask)[:, None]],
            axis=1, dtype=np.float32)
        scan_np = np.concatenate(
            [np.asarray(pts_j), np.asarray(off_j)[:, None],
             np.asarray(pmask)[:, None]], axis=1, dtype=np.float32)
        blobs.append((imu_np, scan_np, t_beg, t_end))
    imu_b = jnp.array(np.stack([b[0] for b in blobs]))
    scan_b = jnp.array(np.stack([b[1] for b in blobs]))
    scals = jnp.array([[b[2], b[3], b[2] - 0.1, pipe.jour, float(i)]
                       for i, b in enumerate(blobs)], jnp.float32)
    outs = pipe._jit_megastep_k(pipe.x, pipe.levels, pipe.win, pipe.mp,
                                pipe.preints_dev, imu_b, scan_b, scals)
    jax.block_until_ready(outs)
    n_dev = 8
    t0 = time.time()
    x, levels, win, mp, preints = outs[:5]
    for _ in range(n_dev):
        outs = pipe._jit_megastep_k(x, levels, win, mp, preints,
                                    imu_b, scan_b, scals)
        x, levels, win, mp, preints = outs[:5]
    jax.block_until_ready(outs)
    dev_ms = (time.time() - t0) / (n_dev * K) * 1e3

    print(json.dumps({
        "metric": "odometry+localBA frames/s/chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
        "fps_runs": [round(f, 2) for f in fps_runs],
        "device_ms_per_scan": round(dev_ms, 2),
    }))


if __name__ == "__main__":
    main()
