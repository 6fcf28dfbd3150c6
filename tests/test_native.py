"""Native C++ ingest library vs the numpy decoders (voxelslam_tpu.native
mirrors feature_point.hpp's role; both paths must agree)."""

import numpy as np
import pytest

from voxelslam_tpu import native
from voxelslam_tpu.io import decoders

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _livox_arr(n=4000, seed=0):
    dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("intensity", "<f4"), ("offset_time", "<u4")])
    rng = np.random.default_rng(seed)
    arr = np.zeros(n, dt)
    arr["x"], arr["y"], arr["z"] = rng.uniform(-30, 30, (3, n))
    arr["intensity"] = rng.uniform(0, 255, n)
    arr["offset_time"] = (rng.uniform(0, 0.1, n) * 1e9).astype(np.uint32)
    return arr


def test_native_matches_numpy_livox():
    arr = _livox_arr()
    nat = decoders.decode(arr, "livox", blind=1.0, point_filter_num=2,
                          use_native=True)
    ref = decoders.decode(arr, "livox", blind=1.0, point_filter_num=2,
                          use_native=False)
    assert len(nat["points"]) == len(ref["points"])
    np.testing.assert_allclose(np.sort(nat["points"], axis=0),
                               np.sort(ref["points"], axis=0), atol=1e-5)
    assert np.all(np.diff(nat["offsets"]) >= 0)


def test_native_hesai_absolute_stamps():
    dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("intensity", "<f4"), ("timestamp", "<f8")])
    rng = np.random.default_rng(1)
    n = 2000
    arr = np.zeros(n, dt)
    arr["x"], arr["y"], arr["z"] = rng.uniform(-30, 30, (3, n))
    arr["timestamp"] = 1700000000.0 + rng.uniform(0, 0.1, n)
    nat = decoders.decode(arr, "hesai", use_native=True)
    ref = decoders.decode(arr, "hesai", use_native=False)
    assert len(nat["points"]) == len(ref["points"])
    assert nat["offsets"].min() >= 0 and nat["offsets"].max() <= 0.11
    np.testing.assert_allclose(np.sort(nat["offsets"]),
                               np.sort(ref["offsets"]), atol=1e-5)


def test_native_yaw_times():
    rng = np.random.default_rng(2)
    ang = np.sort(rng.uniform(0, 2 * np.pi, 500))[::-1]  # clockwise scan
    pts = np.stack([np.cos(ang), np.sin(ang),
                    np.zeros_like(ang)], -1).astype(np.float32) * 10
    offs = native.yaw_times(pts)
    assert offs[0] == 0.0
    assert np.all(offs >= 0) and offs.max() < 0.1
    assert np.all(np.diff(offs) >= 0)


def test_native_downsample_centroid():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-8, 8, (20000, 3)).astype(np.float32)
    down = native.voxel_downsample_host(pts, 1.0)
    # a 16^3 grid can have at most 17^3 occupied cells; centroid stays
    # inside its cell
    assert 0 < len(down) <= 17 ** 3
    cell = np.floor(down / 1.0)
    assert np.all(down >= cell) and np.all(down <= (cell + 1))


def test_native_blind_and_decimation():
    arr = _livox_arr(3000, seed=4)
    out = decoders.decode(arr, "livox", blind=5.0, point_filter_num=3,
                          use_native=True)
    r = np.linalg.norm(out["points"], axis=1)
    assert r.min() > 5.0
    ref = decoders.decode(arr, "livox", blind=5.0, point_filter_num=3,
                          use_native=False)
    assert len(out["points"]) == len(ref["points"])


# ---------------------------------------------------------------------------
# prefetching dataset loader (native/loader.cpp)
# ---------------------------------------------------------------------------

def _write_dataset(tmpdir, structured: bool, n_scans=5, n_pts=3000):
    rng = np.random.default_rng(7)
    rows = []
    t = 10.0
    for k in range(n_scans):
        if structured:
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("intensity", "<f4"), ("offset_time", "<u4")])
            arr = np.zeros(n_pts, dt)
            arr["x"], arr["y"], arr["z"] = rng.uniform(-30, 30, (3, n_pts))
            arr["intensity"] = rng.uniform(0, 255, n_pts)
            arr["offset_time"] = (rng.uniform(0, 0.1, n_pts) * 1e9).astype(
                np.uint32)
        else:
            arr = np.zeros((n_pts, 4), np.float32)
            arr[:, :3] = rng.uniform(-30, 30, (n_pts, 3))
            arr[:, 3] = rng.uniform(0, 0.1, n_pts)
        fname = f"scan_{k:04d}.npy"
        np.save(str(tmpdir / fname), arr)
        rows.append((t, t + 0.1, fname))
        t += 0.1
    return rows


@pytest.mark.parametrize("structured", [True, False])
def test_scan_loader_matches_python_path(tmp_path, structured):
    """The C++ prefetch loader must produce the same decoded scans as
    cli._load_scan_file (points and offsets, time-sorted)."""
    from voxelslam_tpu.cli import _load_scan_file

    rows = _write_dataset(tmp_path, structured)
    loader = native.ScanLoader(
        [(tb, te, str(tmp_path / fn)) for tb, te, fn in rows],
        "livox", blind=1.0, point_filter_num=2)
    assert len(loader) == len(rows)
    for (tb, te, fn), scan in zip(rows, loader):
        ref = _load_scan_file(str(tmp_path / fn), "livox", blind=1.0,
                              point_filter_num=2)
        assert scan["t_beg"] == pytest.approx(tb)
        assert scan["t_end"] == pytest.approx(te)
        assert len(scan["points"]) == len(ref["points"])
        np.testing.assert_allclose(np.sort(scan["points"], axis=0),
                                   np.sort(ref["points"], axis=0),
                                   atol=1e-5)
        np.testing.assert_allclose(np.sort(scan["offsets"]),
                                   np.sort(ref["offsets"]), atol=1e-6)
        assert np.all(np.diff(scan["offsets"]) >= 0)
    loader.close()


def test_iter_dataset_native_and_python_agree(tmp_path):
    """End-to-end: iter_dataset packets identical through both loaders."""
    from voxelslam_tpu import cli

    rows = _write_dataset(tmp_path, structured=True, n_scans=4)
    with open(tmp_path / "scans.txt", "w") as f:
        for tb, te, fn in rows:
            f.write(f"{tb} {te} {fn}\n")
    ts = np.arange(9.9, 10.0 + 0.1 * len(rows) + 0.05, 1.0 / 200.0)
    rng = np.random.default_rng(8)
    imu = np.column_stack([ts, rng.normal(0, 0.1, (len(ts), 6))])
    np.savetxt(tmp_path / "imu.txt", imu)

    nat = list(cli.iter_dataset(str(tmp_path), "livox", use_native=True))
    ref = list(cli.iter_dataset(str(tmp_path), "livox", use_native=False))
    assert len(nat) == len(ref) > 0
    for a, b in zip(nat, ref):
        np.testing.assert_allclose(a["scan"]["points"], b["scan"]["points"],
                                   atol=1e-5)
        np.testing.assert_allclose(a["imu_ts"], b["imu_ts"])


def test_btcdb_native_matches_python():
    """Native descriptor DB (btcdb.cpp) must reproduce the Python dict
    implementation: same candidates, votes, and kept pairs."""
    from voxelslam_tpu import native
    from voxelslam_tpu.loop.btc import BtcConfig, DescriptorDB

    if not (native.available()
            and hasattr(native.get_lib(), "vs_btcdb_new")):
        import pytest
        pytest.skip("native toolchain unavailable")

    cfg = BtcConfig()
    rng = np.random.default_rng(0)

    def make_desc(seed, n=120):
        r = np.random.default_rng(seed)
        sides = np.sort(r.uniform(2.0, 30.0, (n, 3)), axis=-1).astype(
            np.float32)
        binary = (r.random((n, 3, cfg.code_bits)) > 0.5).astype(
            np.float32)
        valid = r.random(n) > 0.2
        return dict(sides=sides, binary=binary, tri_valid=valid)

    py = DescriptorDB(cfg, use_native=False)
    nat = DescriptorDB(cfg, use_native=True)
    assert nat._nat is not None
    frames = {}
    for f in range(6):
        d = make_desc(f)
        # make frames 2 and 4 share many triangles with the query
        if f in (2, 4):
            q = make_desc(99)
            take = slice(0, 60)
            d["sides"][take] = q["sides"][take] + rng.normal(
                0, 0.02, (60, 3)).astype(np.float32)
            d["binary"][take] = q["binary"][take]
            d["tri_valid"][take] = True
        frames[f] = d
        py.add(f, d)
        nat.add(f, d)

    query = make_desc(99)
    for skip, cur in ((1, 5), (-1, 1 << 30)):
        out_py = py.search(query, skip_near=skip, current_frame=cur)
        out_nat = nat.search(query, skip_near=skip, current_frame=cur)
        assert [(f, v) for f, v, _ in out_py] == \
            [(f, v) for f, v, _ in out_nat]
        for (_, _, kp), (_, _, kn) in zip(out_py, out_nat):
            assert set(kp) == set(kn)
            assert len(kp) == len(kn)
