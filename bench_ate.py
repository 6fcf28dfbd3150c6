"""Accuracy benchmark: odometry+localBA ATE RMSE on the simulator.

BASELINE.md's accuracy metric names HILTI/MARS sequences that are not
available in this environment; until real data is mountable, this
records the quantitative accuracy artifact on the synthetic box-room
sequence (exact ground truth, deskew + BA + marginalization all
exercised): feed ~10 s of simulated scans through the full pipeline on
the default backend and report ATE RMSE against the true trajectory.

Prints ONE JSON line.
"""

import json

import numpy as np


def main():
    import bench  # reuse the bench config + compile cache setup
    bench._enable_compile_cache()
    from voxelslam_tpu.config import SlamConfig, MapConfig, \
        OdometryConfig, LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim
    from voxelslam_tpu.utils.metrics import ate_rmse

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 13, 1 << 14, 1 << 15),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    n_scans = 100
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3,
                               ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=False)

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
        pipe.process_scan(scan["points"][hit], scan["offsets"][hit],
                          ts, gyr, acc, t, t + 0.1)
        t += 0.1
    pipe.flush()

    poses = pipe.scan_poses
    est = np.stack([sp.p for sp in poses])
    gt = np.stack([traj.state_at(sp.t)[1] for sp in poses])
    ate = ate_rmse(est, gt)
    length = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    print(json.dumps({
        "metric": "odometry+localBA ATE RMSE (simulated box room)",
        "value": round(float(ate), 4), "unit": "m",
        "n_scans": len(poses),
        "trajectory_length_m": round(length, 2),
        "ate_per_meter": round(float(ate) / max(length, 1e-9), 6)}))


if __name__ == "__main__":
    main()
