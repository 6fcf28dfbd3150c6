"""Separate device-compute time from tunnel dispatch/transfer latency in
the steady-state scan step.

Measures:
  (1) trivial jitted round trip (dispatch + tiny fetch) = tunnel latency
  (2) megastep throughput: reps pipelined, block at end (device time)
  (3) megastep with a blocking stats fetch per call (the pipeline's
      current behavior)
  (4) full process_scan wall time (bench behavior)
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
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
        LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    n_scans = 16
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 6),
                               speed=1.2, wobble=0.25, yaw_rate=0.3, ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=False)
    packets = []
    t = 0.1
    for k in range(n_scans + 4):
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
    for pkt in packets[:n_scans]:
        pipe.process_scan(*pkt)
    assert pipe.init_done

    # (1) trivial round trip
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    x = f(x)
    np.asarray(x)
    t0 = time.time()
    for _ in range(20):
        x = f(x)
        np.asarray(x)
    print(f"(1) trivial jit + tiny fetch       {(time.time()-t0)/20*1e3:8.2f} ms")

    # host-side packet prep identical to _process_steady_fused
    pts_j, off_j, pmask = pipe._pad_points(packets[n_scans][0],
                                           packets[n_scans][1])
    ts_j, gyr_j, acc_j, imask = pipe._pad_imu(*packets[n_scans][2:5])
    imu_blob = jnp.array(np.concatenate(
        [ts_j[:, None], gyr_j, acc_j, imask[:, None]], axis=1,
        dtype=np.float32))
    scan_blob = jnp.array(np.concatenate(
        [pts_j, off_j[:, None], pmask[:, None]], axis=1, dtype=np.float32))
    scal = jnp.array([1.0, 1.1, 1.0, pipe.jour], jnp.float32)

    # (2) megastep throughput, no per-call fetch. NOTE: megastep donates
    # levels/win/preints, so feed back its own outputs.
    st = pipe.x
    levels, win, mp, preints = pipe.levels, pipe.win, pipe.mp, pipe.preints_dev
    out = pipe._jit_megastep(st, levels, win, mp, preints,
                             imu_blob, scan_blob, scal)
    jax.block_until_ready(out)
    (st, levels, win, mp, preints) = out[:5]
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = pipe._jit_megastep(st, levels, win, mp, preints,
                                 imu_blob, scan_blob, scal)
        (st, levels, win, mp, preints) = out[:5]
    jax.block_until_ready(out)
    print(f"(2) megastep, pipelined            {(time.time()-t0)/reps*1e3:8.2f} ms")

    # (3) megastep + blocking stats fetch per call
    t0 = time.time()
    for _ in range(reps):
        out = pipe._jit_megastep(st, levels, win, mp, preints,
                                 imu_blob, scan_blob, scal)
        (st, levels, win, mp, preints) = out[:5]
        np.asarray(out[5])
    print(f"(3) megastep + stats fetch/call    {(time.time()-t0)/reps*1e3:8.2f} ms")

    # (3b) megastep + upload fresh blobs each call + stats fetch
    t0 = time.time()
    for _ in range(reps):
        ib = jnp.array(np.concatenate(
            [ts_j[:, None], gyr_j, acc_j, imask[:, None]], axis=1,
            dtype=np.float32))
        sb = jnp.array(np.concatenate(
            [pts_j, off_j[:, None], pmask[:, None]], axis=1,
            dtype=np.float32))
        out = pipe._jit_megastep(st, levels, win, mp, preints, ib, sb, scal)
        (st, levels, win, mp, preints) = out[:5]
        np.asarray(out[5])
    print(f"(3b) + fresh uploads each call     {(time.time()-t0)/reps*1e3:8.2f} ms")

    # (4) full process_scan wall
    pipe.x, pipe.levels, pipe.win, pipe.mp, pipe.preints_dev = \
        st, levels, win, mp, preints
    t0 = time.time()
    nt = 0
    for pkt in packets[n_scans:]:
        pipe.process_scan(*pkt)
        nt += 1
    print(f"(4) full process_scan              {(time.time()-t0)/nt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
