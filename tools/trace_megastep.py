"""Capture a jax.profiler trace of the steady-state megastep and print
the top device ops by self time (parsed via tensorboard_plugin_profile).

Usage: python tools/trace_megastep.py [trace_dir]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def enable_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def build_warm_pipeline():
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
    n_scans = 14
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3, ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=False)
    t = 0.1
    last = None
    for k in range(n_scans):
        scan = sim.lidar_scan(traj, t, t + 0.1, normals, dsp,
                              n_az=160, n_el=24, noise=0.01, seed=k)
        hit = scan["hit"]
        ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
        gyr = np.empty((len(ts), 3))
        acc = np.empty((len(ts), 3))
        for i, ti in enumerate(ts):
            gyr[i], acc[i] = traj.imu_at(ti)
        last = (scan["points"][hit], scan["offsets"][hit], ts, gyr, acc,
                t, t + 0.1)
        pipe.process_scan(*last)
        t += 0.1
    assert pipe.init_done
    pts_j, off_j, pmask = pipe._pad_points(last[0], last[1])
    ts_j, gyr_j, acc_j, imask = pipe._pad_imu(last[2], last[3], last[4])
    imu_blob = jnp.array(np.concatenate(
        [ts_j[:, None], gyr_j, acc_j, imask[:, None]], axis=1,
        dtype=np.float32))
    scan_blob = jnp.array(np.concatenate(
        [pts_j, off_j[:, None], pmask[:, None]], axis=1, dtype=np.float32))
    scal = jnp.array([last[5], last[6], last[5] - 0.1, pipe.jour, 0.0],
                     jnp.float32)
    return pipe, (imu_blob, scan_blob, scal)


def main():
    enable_cache()
    import jax

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/megastep_trace"
    pipe, blobs = build_warm_pipeline()
    imu_blob, scan_blob, scal = blobs
    args = (pipe.x, pipe.levels, pipe.win, pipe.mp, pipe.preints_dev,
            pipe._stats_ring, imu_blob, scan_blob, scal)
    outs = pipe._jit_megastep(*args)
    jax.block_until_ready(outs)

    with jax.profiler.trace(trace_dir):
        x, levels, win, mp, preints, ring = outs[:6]
        for _ in range(5):
            outs = pipe._jit_megastep(x, levels, win, mp, preints, ring,
                                      imu_blob, scan_blob, scal)
            x, levels, win, mp, preints, ring = outs[:6]
        jax.block_until_ready(outs)
    print("trace written to", trace_dir, flush=True)

    # --- parse: find the xplane file and dump HLO op stats ---
    xs = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not xs:
        print("no xplane found")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    for tool in ("hlo_stats", "tensorflow_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(xs, tool, {})
        except Exception as e:  # noqa: BLE001
            print(f"[{tool}] failed: {e}")
            continue
        out = os.path.join(trace_dir, f"{tool}.out")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"[{tool}] -> {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
