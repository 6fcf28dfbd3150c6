"""fps-variance probe (VERDICT r4 #7): run bench.py's exact packet
stream and record per-segment wall time, eviction events, and occupancy
to find why one timed segment runs ~15% slower than the others."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import bench
    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, \
        OdometryConfig, LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 13, 1 << 14, 1 << 15),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    warm, n_seg, seg = 22, 3, 40
    n_scans = warm + n_seg * seg
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3,
                               ramp=1.2)
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
    for pkt in packets[:warm]:
        pipe.process_scan(*pkt)
    occ = pipe._jit_occ_counts(pipe.levels)
    lv2, _ = pipe._jit_evict(pipe.levels, jnp.float32(pipe.jour))
    jax.block_until_ready((occ, lv2))
    del lv2
    jax.block_until_ready(pipe.x)

    k = warm
    for s in range(n_seg):
        t0 = time.time()
        evs = []
        tper = []
        for pkt in packets[k:k + seg]:
            t1 = time.time()
            out = pipe.process_scan(*pkt)
            tper.append(time.time() - t1)
            if out.get("evicted"):
                evs.append(pipe.scan_count)
        jax.block_until_ready(pipe.x)
        dt = time.time() - t0
        occ = np.asarray(pipe._jit_occ_counts(pipe.levels))
        load = occ / np.array(cfg.map.capacities)
        slow = np.argsort(tper)[-3:]
        print(f"seg {s}: {seg/dt:.2f} fps wall {dt*1e3:.0f} ms "
              f"evictions at {evs} load {np.round(load, 3)} "
              f"slowest-scan ms {[round(tper[i]*1e3,1) for i in slow]} "
              f"at idx {sorted(slow.tolist())}", flush=True)
        k += seg


if __name__ == "__main__":
    main()
