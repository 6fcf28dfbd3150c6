"""Visualization export: PLY round-trip, trajectory format, recorder."""

import os

import numpy as np

from voxelslam_tpu.utils import viz


class _SP:
    def __init__(self, t, R, p, cloud, session=0):
        self.t = t
        self.R = R
        self.p = p
        self.cloud = cloud
        self.cloud_mask = np.ones(len(cloud), np.float32)
        self.session = session


def _read_ply_xyz(path):
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"end_header\n")
    n = int([ln for ln in head.split(b"\n")
             if ln.startswith(b"element vertex")][0].split()[-1])
    has_color = b"uchar red" in head
    if has_color:
        rec = np.frombuffer(body, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)],
                            count=n)
        return rec["xyz"].copy(), rec["rgb"].copy()
    return np.frombuffer(body, dtype="<f4", count=n * 3).reshape(n, 3), None


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    viz.write_ply(p, pts)
    got, _ = _read_ply_xyz(p)
    np.testing.assert_allclose(got, pts, rtol=0, atol=0)


def test_ply_colored(tmp_path):
    pts = np.zeros((10, 3), np.float32)
    col = np.full((10, 3), 7, np.uint8)
    p = str(tmp_path / "c.ply")
    viz.write_ply_colored(p, pts, col)
    got, rgb = _read_ply_xyz(p)
    assert rgb is not None and (rgb == 7).all()


def test_trajectory_and_map(tmp_path):
    R = np.eye(3)
    sps = [_SP(0.1 * i, R, np.array([i, 0.0, 0.0]),
               np.zeros((5, 3), np.float32)) for i in range(4)]
    tp = str(tmp_path / "traj.txt")
    viz.export_trajectory(tp, sps)
    rows = np.loadtxt(tp)
    assert rows.shape == (4, 8)
    np.testing.assert_allclose(rows[:, 1], np.arange(4))
    # identity rotation -> quat (0,0,0,1)
    np.testing.assert_allclose(rows[:, 4:8], [[0, 0, 0, 1]] * 4, atol=1e-9)

    mp = str(tmp_path / "map.ply")
    viz.export_map(mp, sps)
    got, _ = _read_ply_xyz(mp)
    assert got.shape == (20, 3)
    # world transform applied: scan i's points all at x=i
    assert set(np.unique(got[:, 0])) == {0.0, 1.0, 2.0, 3.0}


def test_map_jump_subsample(tmp_path):
    sps = [_SP(0.0, np.eye(3), np.zeros(3),
               np.random.default_rng(1).normal(
                   size=(1000, 3)).astype(np.float32))]
    mp = str(tmp_path / "m.ply")
    viz.export_map(mp, sps, max_points=100)
    got, _ = _read_ply_xyz(mp)
    assert len(got) <= 100


def test_session_colors(tmp_path):
    sps = [_SP(0.0, np.eye(3), np.zeros(3),
               np.zeros((5, 3), np.float32), session=s) for s in (0, 1)]
    mp = str(tmp_path / "s.ply")
    viz.export_map_sessions(mp, sps)
    _, rgb = _read_ply_xyz(mp)
    assert len(np.unique(rgb, axis=0)) == 2


def test_recorder(tmp_path):
    class _Sys:
        scan_poses = [_SP(0.0, np.eye(3), np.zeros(3),
                          np.zeros((5, 3), np.float32))]

    rec = viz.SlamRecorder(str(tmp_path / "rec"), every=1, save_scans=True)
    rec.on_scan(_Sys(), {"phase": "odom"})
    assert os.path.exists(tmp_path / "rec" / "trajectory.txt")
    assert os.path.exists(tmp_path / "rec" / "scan_000001.ply")
    rec.flush(_Sys())
    assert os.path.exists(tmp_path / "rec" / "map.ply")
    rec.clear()
    assert not os.listdir(tmp_path / "rec")
