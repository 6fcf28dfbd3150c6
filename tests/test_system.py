"""System-level integration: loop pipeline corrections + full SlamSystem.

Covers the dataflow the reference runs across three threads
(odometry -> buf_lba2loop -> loop thread -> loop_detect correction,
voxelslam.cpp:1740/2158) as a deterministic pipeline.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
    LocalBAConfig, LoopConfig
from voxelslam_tpu.io import simulator as sim
from voxelslam_tpu.pipeline.loop import LoopPipeline
from voxelslam_tpu.pipeline.odometry import ScanPose
from voxelslam_tpu.pipeline.system import SlamSystem

P = 2048


@pytest.fixture(scope="module")
def scene():
    return sim.make_scene()


def yaw_R(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])


def scan_cloud(scene, p, R, seed):
    dirs, _ = sim.scan_directions(140, 14)
    pc, hit = sim.raycast(np.asarray(p, float), R, dirs, scene)
    body = pc[hit]
    rng = np.random.default_rng(seed)
    body = body + rng.normal(0, 0.01, body.shape)
    out = np.zeros((P, 3), np.float32)
    m = np.zeros(P, np.float32)
    n = min(len(body), P)
    out[:n] = body[:n]
    m[:n] = 1
    return out, m


@pytest.mark.slow
def test_loop_pipeline_corrects_drift(scene):
    """Out-and-back trajectory with linearly injected drift: the loop
    pipeline must detect the revisit and its pose-graph burst must
    remove most of the drift from the written-back poses."""
    poses = [(yaw_R(0.0), np.array([0.1 * i, 0.0, 1.0]))
             for i in range(70)]
    poses += [(yaw_R(np.pi), np.array([7.0 - 0.1 * i, 0.6, 1.0]))
              for i in range(70)]
    cfg = SlamConfig(loop=LoopConfig(curr_halt=3, descriptor_near_num=5))
    lp = LoopPipeline(cfg)
    lp.new_session()

    drift_rate = 0.5 / 140.0     # metres of +y drift per scan
    n_corr = 0
    for k, (R, p) in enumerate(poses):
        cloud, m = scan_cloud(scene, p, R, k)
        sp = ScanPose(t=0.1 * k, R=R.copy(),
                      p=p + np.array([0, drift_rate * k, 0]),
                      v=np.zeros(3), v6=np.full(6, 1e-4),
                      cloud=cloud, cloud_mask=m, session=0)
        c = lp.push(sp)
        if c is not None:
            n_corr += 1
            assert len(c.map_keyframes) > 0
            assert np.isfinite(c.dx_p).all()
    assert n_corr >= 1, "no loop correction fired"
    assert len(lp.lp_edges) >= 1

    n_sp = len(lp.scan_poses[0])
    final_err = np.linalg.norm(lp.scan_poses[0][-1].p - poses[n_sp - 1][1])
    injected = drift_rate * n_sp
    assert final_err < 0.5 * injected, (final_err, injected)


@pytest.mark.slow
def test_slam_system_with_loop_smoke(scene):
    """SlamSystem end-to-end smoke: odometry + loop pipeline wired,
    keyframes created, poses emitted, no divergence reset."""
    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 11, 1 << 12, 1 << 12),
                      unique_max=(1024, 2048, 2048)),
        odom=OdometryConfig(point_max=1024, imu_max=48, down_size=0.4),
        lba=LocalBAConfig(factor_max=256),
        loop=LoopConfig(descriptor_near_num=5),
    )
    traj = sim.make_trajectory(duration=3.6, speed=1.0, wobble=0.25,
                               yaw_rate=0.3, still=0.45)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    sysm = SlamSystem(cfg)
    t, k = 0.2, 0
    while t + 0.1 < 3.1:
        scan = sim.lidar_scan(traj, t, t + 0.1, normals, dsp,
                              n_az=110, n_el=12, noise=0.01, seed=k)
        hit = scan["hit"]
        ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
        gyr = np.empty((len(ts), 3))
        acc = np.empty((len(ts), 3))
        for i, ti in enumerate(ts):
            gyr[i], acc[i] = traj.imu_at(ti)
        out = sysm.process_scan(scan["points"][hit], scan["offsets"][hit],
                                ts, gyr, acc, t, t + 0.1)
        assert out.get("phase") != "reset"
        t += 0.1
        k += 1
    sysm.finish()
    assert len(sysm.scan_poses) > 15
    assert len(sysm.loop.keyframes[0]) >= 1
    est = np.stack([sp.p for sp in sysm.scan_poses])
    gt = np.stack([traj.state_at(sp.t)[1] for sp in sysm.scan_poses])
    from voxelslam_tpu.utils.metrics import ate_rmse
    assert ate_rmse(est, gt) < 0.10
