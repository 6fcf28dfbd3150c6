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
