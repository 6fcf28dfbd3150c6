"""Accuracy benchmark: odometry+localBA ATE RMSE on the simulator.

BASELINE.md's accuracy metric names HILTI/MARS sequences that are not
available in this environment; until real data is mountable, this
records the quantitative accuracy artifact on synthetic sequences with
exact ground truth (deskew + BA + marginalization all exercised), on
two scenes:

  * box room — the longstanding planar baseline scene
  * cluttered — make_cluttered_scene: box pillars + cylinder facets
    (curved, breaks the all-planar assumption) + inclined ramps +
    bounded-patch occlusion + range-dependent return dropout — the
    closest available proxy for real-bag geometry (VERDICT r4 #6)

Prints ONE JSON line per scene.
"""

import json

import numpy as np


def run_scene(name, scene_obj, dropout_at=None, n_scans=100):
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
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3,
                               ramp=1.2)
    pipe = SlamPipeline(cfg, collect_clouds=False)

    t = 0.1
    for k in range(n_scans):
        scan = sim.lidar_scan(traj, t, t + 0.1, scene_obj, None,
                              n_az=160, n_el=24, noise=0.01, seed=k,
                              dropout_at=dropout_at)
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
        "metric": f"odometry+localBA ATE RMSE (simulated {name})",
        "value": round(float(ate), 4), "unit": "m",
        "n_scans": len(poses),
        "trajectory_length_m": round(length, 2),
        "ate_per_meter": round(float(ate) / max(length, 1e-9), 6)}),
        flush=True)


def main():
    import bench  # reuse the bench config + compile cache setup
    bench._enable_compile_cache()
    from voxelslam_tpu.io import simulator as sim

    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    run_scene("box room", sim.Scene.from_planes(normals, dsp))
    run_scene("cluttered scene",
              sim.make_cluttered_scene(half_extent=(16.0, 13.0, 3.8),
                                       center=(4.0, 0.0, 1.2),
                                       pillars=6, cylinders=5, ramps=2,
                                       seed=11),
              dropout_at=22.0)


if __name__ == "__main__":
    main()
