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
                 noise=0.01, speed=1.0, cfg=None, scan_cb=None,
                 acc_scale=1.0, collect_clouds=True):
    """acc_scale: scale applied to the simulated accelerometer stream —
    1/9.8 emulates a g-normalized Livox IMU (reference ekf_imu.hpp:199)."""
    cfg = cfg or e2e_config()
    traj = sim.make_trajectory(duration=duration + 0.5, speed=speed,
                               wobble=0.25, yaw_rate=0.3, still=0.45)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=collect_clouds)

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
                                ts, gyr, acc * acc_scale, t_beg, t_end)
        if scan_cb:
            scan_cb(k, out, pipe)
        gts.append(traj.state_at(t_end))
        t = t_end
        k += 1
    pipe.flush()
    return pipe, traj, gts


def test_g_normalized_imu_detected():
    """Static init detects g-normalized (|acc| ~ 1) Livox IMUs and sets
    scale_gravity = 9.8 (reference IMU_init, ekf_imu.hpp:199-209)."""
    cfg = e2e_config()   # lidar_type defaults to "livox"
    pipe = SlamPipeline(cfg)
    rng = np.random.default_rng(0)
    ts = np.arange(0.0, 0.4, 1.0 / 200.0)
    gyr = rng.normal(0, 1e-3, (len(ts), 3))
    acc = np.tile([0.0, 0.0, 1.0], (len(ts), 1)) \
        + rng.normal(0, 1e-3, (len(ts), 3))
    out = pipe.process_scan(np.zeros((4, 3), np.float32),
                            np.zeros(4, np.float32), ts, gyr, acc,
                            0.0, 0.4)
    assert out["phase"] == "imu_init"
    assert abs(pipe._scale_gravity - 9.8) < 1e-5
    g = np.asarray(pipe._gravity)
    assert 9.6 < np.linalg.norm(g) < 10.0   # gravity back in SI units

    # SI-unit IMU on a non-livox sensor: no scaling
    cfg2 = dataclasses.replace(cfg, lidar_type="hesai")
    pipe2 = SlamPipeline(cfg2)
    out2 = pipe2.process_scan(np.zeros((4, 3), np.float32),
                              np.zeros(4, np.float32), ts, gyr,
                              acc * 9.81, 0.0, 0.4)
    assert pipe2._scale_gravity == 1.0


@pytest.mark.slow
def test_e2e_g_normalized_ate_matches_si():
    """Full pipeline fed acc/9.8 (g-normalized Livox) must converge with
    the same ATE as SI-unit input — the scale must reach every
    propagate/preintegrate consumer (VERDICT r2 missing #2)."""
    pipe, traj, gts = run_sequence(duration=4.0, acc_scale=1.0 / 9.8)
    assert abs(pipe._scale_gravity - 9.8) < 1e-5
    poses = pipe.scan_poses
    assert len(poses) > 20
    est = np.stack([sp.p for sp in poses])
    gt = np.stack([traj.state_at(sp.t)[1] for sp in poses])
    ate = ate_rmse(est, gt)
    # 9.8 vs the simulator's 9.81 leaves a ~0.1% residual scale; allow a
    # slightly wider bound than the SI test's 0.10
    assert ate < 0.12, f"ATE {ate:.3f} m"


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


@pytest.mark.slow
def test_g_update_relocalization_reestimates_gravity():
    """A g_update loop correction must re-optimize gravity jointly with
    the window (reference LI_BA_OptimizerGravity at g_update==2,
    voxelslam.cpp:1956-1965), not merely rotate it: a corrupted gravity
    estimate is pulled back toward truth by the reloc BA."""
    import jax.numpy as jnp
    from voxelslam_tpu.core import so3

    pipe, traj, gts = run_sequence(duration=3.0)
    assert pipe.init_done
    g_true = np.asarray(pipe.win.g[0])          # aligned: ~[0, 0, -9.81]

    def ang(a, b):
        c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    Rp = np.asarray(so3.exp(jnp.array([0.06, 0.0, 0.0])))
    g_bad = Rp @ g_true
    pipe.win = dataclasses.replace(
        pipe.win, g=jnp.broadcast_to(jnp.array(g_bad, jnp.float32),
                                     pipe.win.g.shape))
    ang0 = ang(g_bad, g_true)
    assert ang0 > 3.0

    pipe.apply_correction(np.eye(3), np.zeros(3), g_update=True,
                          map_keyframes=[])
    g_new = np.asarray(pipe._gravity)
    ang1 = ang(g_new, g_true)
    assert np.isfinite(g_new).all()
    assert 9.4 < np.linalg.norm(g_new) < 10.2
    # re-estimated, not just rotated: the corruption shrinks
    assert ang1 < 0.7 * ang0, (ang0, ang1)


@pytest.mark.slow
def test_e2e_mgsize2_per_scan_v6():
    """lba.mgsize=2: two scans marginalized per slide, each carrying its
    OWN Hessian-derived v6 (reference per-frame blocks,
    voxelslam.cpp:1974-1980) — previously untested and shared."""
    cfg = dataclasses.replace(e2e_config(),
                              lba=LocalBAConfig(factor_max=256, mgsize=2))
    pipe, traj, gts = run_sequence(duration=4.0, cfg=cfg)
    poses = pipe.scan_poses
    assert len(poses) > 12
    est = np.stack([sp.p for sp in poses])
    gt = np.stack([traj.state_at(sp.t)[1] for sp in poses])
    ate = ate_rmse(est, gt)
    assert ate < 0.15, f"ATE {ate:.3f} m"
    # steady-phase emissions come in pairs sharing one BA burst; the two
    # frames of a pair must carry different v6 (per-frame blocks). Skip
    # the init-phase emissions (first W) and the flush tail (ones).
    W = cfg.lba.win_size
    pairs = 0
    for a, b in zip(poses[W:-W:2], poses[W + 1:-W:2]):
        if np.allclose(a.v6, 1.0) or np.allclose(b.v6, 1.0):
            continue
        assert not np.allclose(a.v6, b.v6), (a.v6, b.v6)
        pairs += 1
    assert pairs > 2


@pytest.mark.slow
def test_e2e_batched_dispatch_matches_single():
    """K-scan fused dispatch (odom.batch_scans=4, one lax.scan'd device
    call per 4 scans) must reproduce the per-scan dispatch trajectory:
    the scan body is the same megastep, only the host/device call
    granularity changes. Poses may differ by fusion-level float noise
    only. Also exercises the partial-queue drain at flush()."""
    cfg = e2e_config()   # odom.batch_scans defaults to 4
    assert cfg.odom.batch_scans == 4
    cfg1 = dataclasses.replace(
        cfg, odom=dataclasses.replace(cfg.odom, batch_scans=1))
    # 3.3 s at 10 Hz = 32 scans: init (10) + 22 steady = 5 full batches
    # of 4 + a 2-scan partial drained at flush
    pipe_b, traj, _ = run_sequence(duration=3.3, cfg=cfg,
                                   collect_clouds=False)
    pipe_s, _, _ = run_sequence(duration=3.3, cfg=cfg1,
                                collect_clouds=False)
    pb, ps = pipe_b.scan_poses, pipe_s.scan_poses
    assert len(pb) == len(ps) and len(pb) > 20
    for a, b in zip(pb, ps):
        assert a.t == b.t
        np.testing.assert_allclose(a.p, b.p, atol=5e-4)
        np.testing.assert_allclose(a.R, b.R, atol=5e-4)
    est = np.stack([sp.p for sp in pb])
    gt = np.stack([traj.state_at(sp.t)[1] for sp in pb])
    assert ate_rmse(est, gt) < 0.12
