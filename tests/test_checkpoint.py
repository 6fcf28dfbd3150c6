"""Mid-run checkpoint/resume: a restored system must continue exactly
like the original (same backend, same scans => same poses)."""

import numpy as np
import pytest

from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
    LocalBAConfig
from voxelslam_tpu.pipeline.system import SlamSystem
from voxelslam_tpu.io import simulator as sim


def _cfg():
    return SlamConfig(
        map=MapConfig(capacities=(1 << 11, 1 << 12, 1 << 12),
                      unique_max=(1024, 1024, 2048)),
        odom=OdometryConfig(point_max=1024, imu_max=64),
        lba=LocalBAConfig(factor_max=256),
    )


def _packets(n_scans, seed0=0):
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3,
                               ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    out = []
    t = 0.1
    for k in range(n_scans):
        scan = sim.lidar_scan(traj, t, t + 0.1, normals, dsp,
                              n_az=96, n_el=16, noise=0.01, seed=seed0 + k)
        hit = scan["hit"]
        ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
        gyr = np.empty((len(ts), 3))
        acc = np.empty((len(ts), 3))
        for i, ti in enumerate(ts):
            gyr[i], acc[i] = traj.imu_at(ti)
        out.append((scan["points"][hit], scan["offsets"][hit], ts, gyr,
                    acc, t, t + 0.1))
        t += 0.1
    return out


@pytest.mark.slow
def test_checkpoint_resume_bitexact(tmp_path):
    n_pre, n_post = 16, 4
    pkts = _packets(n_pre + n_post)

    sys1 = SlamSystem(_cfg(), enable_loop=True)
    for p in pkts[:n_pre]:
        sys1.process_scan(*p)
    assert sys1.odom.init_done
    sc_at_save = sys1.odom.scan_count
    ck = str(tmp_path / "live.ckpt")
    sys1.save_checkpoint(ck)

    # original continues
    ps_ref = []
    for p in pkts[n_pre:]:
        sys1.process_scan(*p)
        ps_ref.append(np.asarray(sys1.odom.x.p).copy())

    # restored system continues on the same scans
    sys2 = SlamSystem(_cfg(), enable_loop=True)
    sys2.load_checkpoint(ck)
    assert sys2.odom.init_done
    assert sys2.odom.scan_count == sc_at_save
    ps_new = []
    for p in pkts[n_pre:]:
        sys2.process_scan(*p)
        ps_new.append(np.asarray(sys2.odom.x.p).copy())

    for a, b in zip(ps_ref, ps_new):
        np.testing.assert_allclose(a, b, atol=1e-5)
    assert len(sys2.scan_poses) == len(sys1.scan_poses)
