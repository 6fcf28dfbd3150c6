"""End-to-end odometry + local BA on a simulated room sequence.

This is the round-1 equivalent of BASELINE.json config #1 (single-session
odometry + sliding-window local BA, no loop closure): scan in -> pose
out, ATE checked against exact simulator ground truth.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, LocalBAConfig
from voxelslam_tpu.pipeline import SlamPipeline
from voxelslam_tpu.io import simulator as sim
from voxelslam_tpu.utils.metrics import ate_rmse


def e2e_config():
    return SlamConfig(
        map=MapConfig(capacities=(1 << 11, 1 << 12, 1 << 12),
                      unique_max=(1024, 2048, 2048)),
        odom=OdometryConfig(point_max=1024, imu_max=48, down_size=0.4),
        lba=LocalBAConfig(factor_max=256),
    )


def run_sequence(duration=5.0, scan_hz=10.0, imu_hz=200.0, n_az=110, n_el=12,
                 noise=0.01, speed=1.0, cfg=None, scan_cb=None):
    cfg = cfg or e2e_config()
    traj = sim.make_trajectory(duration=duration + 0.5, speed=speed,
                               wobble=0.25, yaw_rate=0.3, still=0.45)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg)

    dt_scan = 1.0 / scan_hz
    t = 0.2
    gts = []
    k = 0
    while t + dt_scan < duration:
        t_beg, t_end = t, t + dt_scan
        scan = sim.lidar_scan(traj, t_beg, t_end, normals, dsp,
                              n_az=n_az, n_el=n_el, noise=noise, seed=k)
        hit = scan["hit"]
        ts = np.arange(t_beg - 0.01, t_end + 1e-6, 1.0 / imu_hz)
        gyr = np.empty((len(ts), 3))
        acc = np.empty((len(ts), 3))
        for i, ti in enumerate(ts):
            gyr[i], acc[i] = traj.imu_at(ti)
        out = pipe.process_scan(scan["points"][hit], scan["offsets"][hit],
                                ts, gyr, acc, t_beg, t_end)
        if scan_cb:
            scan_cb(k, out, pipe)
        gts.append(traj.state_at(t_end))
        t = t_end
        k += 1
    pipe.flush()
    return pipe, traj, gts


@pytest.mark.slow
def test_e2e_odometry_ate():
    pipe, traj, gts = run_sequence(duration=4.0)
    poses = pipe.scan_poses
    assert len(poses) > 20, len(poses)
    est = np.stack([sp.p for sp in poses])
    # ground truth at the matching timestamps
    gt = np.stack([traj.state_at(sp.t)[1] for sp in poses])
    ate = ate_rmse(est, gt)
    assert np.isfinite(ate)
    assert ate < 0.10, f"ATE {ate:.3f} m"
    # trajectory actually moved
    assert np.linalg.norm(gt[-1] - gt[0]) > 1.0
