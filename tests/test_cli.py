"""CLI entry point (voxelslam_tpu.cli) — the reference's executable +
launch-file surface (reference voxelslam.cpp:3144-3170 main; launch/
vxlm_*.launch reading config/*.yaml)."""

import json
import os

import numpy as np
import pytest

from voxelslam_tpu import cli
from voxelslam_tpu.config import preset


def run_cli(argv):
    lines = []
    rc = cli.main(argv, log=lines.append)
    return rc, lines


def test_info_lists_presets():
    rc, lines = run_cli(["info"])
    assert rc == 0
    for name in ("avia", "avia_fly", "hesai", "mid360", "ouster",
                 "velodyne"):
        assert name in lines


def test_info_shows_preset_json():
    rc, lines = run_cli(["info", "hesai"])
    assert rc == 0
    d = json.loads("\n".join(lines))
    assert d["lidar_type"] == preset("hesai").lidar_type
    assert "map" in d and "odom" in d and "loop" in d


def test_config_override():
    from voxelslam_tpu.config import override
    cfg = preset("hesai")
    cfg2 = override(cfg, {"odom": {"point_max": 1024},
                          "map": {"capacities": [64, 64, 128]},
                          "lidar_type": "ouster"})
    assert cfg2.odom.point_max == 1024
    assert cfg2.map.capacities == (64, 64, 128)
    assert cfg2.lidar_type == "ouster"
    # untouched fields keep preset values
    assert cfg2.odom.down_size == cfg.odom.down_size
    with pytest.raises(AttributeError):
        override(cfg, {"no_such_section": 1})


def _write_dataset(dirpath, n_scans=4, pts_per_scan=50, imu_hz=100.0):
    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    t_end_all = 0.2 + 0.1 * n_scans
    ts = np.arange(0.0, t_end_all + 0.05, 1.0 / imu_hz)
    imu = np.column_stack([ts, rng.normal(0, 0.01, (len(ts), 3)),
                           rng.normal((0, 0, 9.81), 0.01, (len(ts), 3))])
    np.savetxt(os.path.join(dirpath, "imu.txt"), imu)
    rows = []
    for k in range(n_scans):
        t0 = 0.2 + 0.1 * k
        pts = rng.uniform(1.0, 8.0, (pts_per_scan, 3)).astype(np.float32)
        offs = np.sort(rng.uniform(0, 0.1, pts_per_scan)).astype(np.float32)
        np.save(os.path.join(dirpath, f"scan_{k}.npy"),
                np.column_stack([pts, offs]))
        rows.append(f"{t0:.3f} {t0 + 0.1:.3f} scan_{k}.npy")
    with open(os.path.join(dirpath, "scans.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


def test_iter_dataset_sync(tmp_path):
    """Dataset iterator pairs each scan with IMU samples covering its
    interval (sync_packages semantics, reference voxelslam.hpp:112-177)."""
    d = str(tmp_path / "ds")
    _write_dataset(d, n_scans=4)
    pkts = list(cli.iter_dataset(d, "tartanair", blind=0.1))
    assert len(pkts) == 4
    for pkt in pkts:
        scan = pkt["scan"]
        assert pkt["imu_ts"][-1] >= scan["t_end"] - 0.011
        assert len(pkt["imu_ts"]) > 4
        assert scan["points"].shape[1] == 3
        # monotone time offsets (decoder sort)
        assert np.all(np.diff(scan["offsets"]) >= 0)
    # consecutive packets share their boundary IMU sample (continuity)
    assert pkts[1]["imu_ts"][0] <= pkts[0]["imu_ts"][-1]


def test_iter_dataset_point_notime(tmp_path):
    """Stamp-less LiDARs: the scan's nominal time becomes its END, the
    previous scan's time its BEGIN (reference voxelslam.hpp:131-140);
    the first scan only anchors the clock."""
    d = str(tmp_path / "nt")
    _write_dataset(d, n_scans=4)
    pkts = list(cli.iter_dataset(d, "tartanair", blind=0.1,
                                 point_notime=True))
    # first scan consumed as anchor -> one fewer packet
    assert len(pkts) == 3
    # scans.txt t_begs are 0.2, 0.3, 0.4, 0.5
    begs = [p["scan"]["t_beg"] for p in pkts]
    ends = [p["scan"]["t_end"] for p in pkts]
    np.testing.assert_allclose(begs, [0.2, 0.3, 0.4], atol=1e-9)
    np.testing.assert_allclose(ends, [0.3, 0.4, 0.5], atol=1e-9)
    for pkt in pkts:
        assert pkt["imu_ts"][-1] >= pkt["scan"]["t_end"] - 0.011


def test_export_roundtrip(tmp_path):
    """export subcommand: saved session -> TUM trajectory + PLY map."""
    from voxelslam_tpu.pipeline.odometry import ScanPose
    from voxelslam_tpu.io import sessions as ses
    rng = np.random.default_rng(1)
    sps = []
    for i in range(5):
        cloud = rng.uniform(-2, 2, (30, 3)).astype(np.float32)
        sps.append(ScanPose(
            t=0.1 * i, R=np.eye(3), p=np.array([0.5 * i, 0.0, 1.0]),
            v=np.zeros(3), v6=np.ones(6), cloud=cloud,
            cloud_mask=np.ones(30, np.float32), session=0))
    sdir = str(tmp_path / "sess0")
    ses.save_session(sdir, sps)

    traj = str(tmp_path / "traj.tum")
    ply = str(tmp_path / "map.ply")
    rc, lines = run_cli(["export", sdir, "--export-traj", traj,
                         "--export-map", ply])
    assert rc == 0
    rows = np.loadtxt(traj)
    assert rows.shape == (5, 8)          # t x y z qx qy qz qw
    assert np.allclose(rows[:, 1], 0.5 * np.arange(5), atol=1e-5)
    with open(ply, "rb") as f:
        head = f.read(200)
    assert head.startswith(b"ply")
    assert b"element vertex 150" in head


@pytest.mark.slow
def test_demo_end_to_end(tmp_path):
    """Full demo subcommand on the simulator: init -> steady odometry ->
    session save -> exports. Uses the same static shapes as the e2e
    pipeline test so the persistent compile cache is shared."""
    ov = {"map": {"capacities": [1 << 11, 1 << 12, 1 << 12],
                  "unique_max": [1024, 2048, 2048]},
          "odom": {"point_max": 1024, "imu_max": 48, "down_size": 0.4},
          "lba": {"factor_max": 256}}
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(ov, f)
    save_dir = str(tmp_path / "maps")
    traj = str(tmp_path / "demo.tum")
    rc, lines = run_cli([
        "demo", "--scans", "25", "--preset", "default",
        "--config", cfg_path, "--no-loop",
        "--save-dir", save_dir, "--session-name", "demo0",
        "--export-traj", traj])
    assert rc == 0
    txt = "\n".join(lines)
    assert "ATE RMSE" in txt
    ate = float(txt.split("ATE RMSE vs ground truth:")[1].split("m")[0])
    assert ate < 0.15, txt
    assert os.path.isdir(os.path.join(save_dir, "demo0"))
    rows = np.loadtxt(traj, ndmin=2)
    assert rows.shape[0] > 10
