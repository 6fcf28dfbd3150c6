"""Session persistence: PCD/alidarState/edge.txt round-trips and the
offline multi-session reload path (reference FileReaderWriter +
previous_map_read, voxelslam.cpp:157-457)."""

import dataclasses
import os

import numpy as np
import pytest

from voxelslam_tpu.config import small_test_config
from voxelslam_tpu.io import sessions as ses
from voxelslam_tpu.pipeline.odometry import ScanPose
from voxelslam_tpu.pipeline.loop import LoopPipeline, LoopEdge


def _rand_rot(rng):
    a = rng.normal(size=3)
    a = a / np.linalg.norm(a) * rng.uniform(0.1, 2.5)
    from voxelslam_tpu.io.simulator import _exp
    return _exp(a)


def _mk_sp(rng, i, n_pts=50):
    pts = rng.uniform(-5, 5, (n_pts, 3)).astype(np.float32)
    return ScanPose(
        t=0.1 * i, R=_rand_rot(rng), p=rng.normal(size=3),
        v=rng.normal(size=3), v6=rng.uniform(1e-6, 1e-3, 6),
        cloud=pts, cloud_mask=np.ones(n_pts, np.float32), session=0,
        bg=rng.normal(scale=1e-3, size=3),
        ba=rng.normal(scale=1e-2, size=3),
        g=np.array([0.0, 0.0, -9.81]) + rng.normal(scale=1e-3, size=3))


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(123, 3)).astype(np.float32)
    inten = rng.uniform(0, 255, 123).astype(np.float32)
    path = str(tmp_path / "a.pcd")
    ses.write_pcd(path, pts, inten)
    p2, i2 = ses.read_pcd(path)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_allclose(i2, inten, atol=1e-6)


def test_lidarstate_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    sps = [_mk_sp(rng, i) for i in range(7)]
    path = str(tmp_path / "alidarState.txt")
    ses.write_lidarstate(path, sps)
    back = ses.read_lidarstate(path)
    assert len(back) == 7
    for a, b in zip(sps, back):
        assert abs(a.t - b.t) < 1e-5
        np.testing.assert_allclose(b.R, a.R, atol=1e-5)
        np.testing.assert_allclose(b.p, a.p, atol=1e-5)
        np.testing.assert_allclose(b.v, a.v, atol=1e-5)
        np.testing.assert_allclose(b.bg, a.bg, atol=1e-5)
        np.testing.assert_allclose(b.ba, a.ba, atol=1e-5)
        np.testing.assert_allclose(b.g, a.g, atol=1e-5)
        np.testing.assert_allclose(b.v6, a.v6, rtol=1e-4)


def test_session_dir_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    sps = [_mk_sp(rng, i) for i in range(5)]
    d = str(tmp_path / "sess0")
    ses.save_session(d, sps)
    back = ses.load_session(d)
    assert len(back) == 5
    for a, b in zip(sps, back):
        np.testing.assert_allclose(b.cloud, a.cloud, atol=1e-6)
        np.testing.assert_allclose(b.p, a.p, atol=1e-5)


def test_edges_roundtrip_and_flip(tmp_path):
    rng = np.random.default_rng(3)
    names = ["sessA", "sessB"]
    R = _rand_rot(rng)
    t = rng.normal(size=3)
    edges = [LoopEdge(id_a=0, id_b=1, ord_a=4, ord_b=9, R=R, t=t,
                      v6=np.full(6, 1e-6))]
    path = str(tmp_path / "edge.txt")
    ses.write_edges(path, edges, names)
    back, absent = ses.read_edges(path, names)
    assert not absent
    assert back[0].id_a == 0 and back[0].ord_a == 4
    np.testing.assert_allclose(back[0].R, R, atol=1e-5)
    np.testing.assert_allclose(back[0].t, t, atol=1e-5)

    # unknown session name -> preserved as absent line
    back2, absent2 = ses.read_edges(path, ["sessA", "other"])
    assert not back2 and len(absent2) == 1

    # flipped name order on read -> edge reoriented to id_a <= id_b
    ses.write_edges(path, [LoopEdge(id_a=1, id_b=0, ord_a=9, ord_b=4,
                                    R=R.T, t=-R.T @ t,
                                    v6=np.full(6, 1e-6))], names)
    back3, _ = ses.read_edges(path, names)
    assert back3[0].id_a == 0 and back3[0].ord_a == 4
    np.testing.assert_allclose(back3[0].R, R, atol=1e-5)
    np.testing.assert_allclose(back3[0].t, t, atol=1e-5)


def test_previous_session_reload(tmp_path):
    """Save a simulated session, reload it offline: keyframes regenerate
    and its BTC database answers a place-recognition query from a cloud
    captured at a revisited location."""
    from voxelslam_tpu.io import simulator as sim
    import jax.numpy as jnp

    cfg = small_test_config()
    W = cfg.lba.win_size
    rng = np.random.default_rng(4)
    normals, dsp = sim.box_room(half_extent=(9.0, 7.0, 3.0),
                                center=(2.0, 0.0, 1.0))
    traj = sim.make_trajectory(duration=4.0, speed=1.0, wobble=0.2,
                               yaw_rate=0.25, ramp=1.2)

    # fabricate a session of raw scans with ground-truth poses
    sps = []
    t = 0.1
    for i in range(3 * W):
        scan = sim.lidar_scan(traj, t, t + 0.1, normals, dsp,
                              n_az=100, n_el=16, noise=0.01, seed=i)
        hit = scan["hit"]
        R, p, v = traj.state_at(t + 0.1)
        body = scan["points"][hit]
        sps.append(ScanPose(
            t=t, R=R, p=p, v=v, v6=np.full(6, 1e-4),
            cloud=body.astype(np.float32),
            cloud_mask=np.ones(len(body), np.float32), session=0))
        t += 0.1
    d = str(tmp_path / "prior")
    ses.save_session(d, sps)

    lp = LoopPipeline(cfg)
    ses.load_previous_sessions(lp, str(tmp_path), ["prior"])
    assert len(lp.scan_poses) == 1
    assert len(lp.keyframes[0]) == 3
    assert len(lp.dbs[0].frames) >= 1

    # query: a fresh keyframe-like cloud at the first keyframe's pose
    from voxelslam_tpu.loop.btc import extract as btc_extract
    kf0 = lp.keyframes[0][0]
    desc = btc_extract(jnp.array(kf0.cloud), jnp.array(kf0.mask),
                       lp.btc_cfg)
    desc_np = {k: np.asarray(v) for k, v in desc.items()}
    cands = lp.dbs[0].search(desc_np, skip_near=-1, current_frame=1 << 30)
    assert cands, "reloaded BTC DB returned no candidates"
