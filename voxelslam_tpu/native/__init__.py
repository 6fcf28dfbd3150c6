"""Native host runtime: C++ ingest/downsample bound via ctypes.

The reference's runtime is pure C++ (feature_point.hpp decoding,
tools.hpp host downsampling); here the JAX compute path is fed by this
native data loader. Builds lazily with g++ on first use and caches the
shared object next to the source; everything degrades to the numpy
decoders in voxelslam_tpu.io.decoders when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ingest.cpp")
_SRC_LOADER = os.path.join(_HERE, "loader.cpp")
_SRC_BTCDB = os.path.join(_HERE, "btcdb.cpp")
_SO = os.path.join(_HERE, "libvsingest.so")
_lock = threading.Lock()
_lib = None
_tried = False

# field type codes matching ingest.cpp read_field
_TYPE_CODES = {"f4": 0, "f8": 1, "u4": 2, "i4": 3, "u2": 4, "u1": 5,
               "i8": 6, "u8": 7}


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, _SRC_LOADER, _SRC_BTCDB, "-o", _SO,
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, building it on first call; None if a
    native toolchain is unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_LOADER),
                        os.path.getmtime(_SRC_BTCDB))
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.vs_decode.restype = ctypes.c_int64
        lib.vs_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int,
            ctypes.c_double, ctypes.c_int64, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.vs_yaw_times.restype = None
        lib.vs_yaw_times.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_double, ctypes.c_void_p]
        lib.vs_voxel_downsample.restype = ctypes.c_int64
        lib.vs_voxel_downsample.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int64, ctypes.c_void_p]
        try:
            lib.vs_loader_open.restype = ctypes.c_void_p
            lib.vs_loader_open.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double,
                ctypes.c_int, ctypes.c_double, ctypes.c_int64,
                ctypes.c_double, ctypes.c_int64]
            lib.vs_loader_count.restype = ctypes.c_int64
            lib.vs_loader_count.argtypes = [ctypes.c_void_p]
            lib.vs_loader_next.restype = ctypes.c_int64
            lib.vs_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
            lib.vs_loader_close.restype = None
            lib.vs_loader_close.argtypes = [ctypes.c_void_p]
        except AttributeError:  # stale .so without the loader
            pass
        try:
            lib.vs_btcdb_new.restype = ctypes.c_void_p
            lib.vs_btcdb_new.argtypes = [ctypes.c_double, ctypes.c_int64]
            lib.vs_btcdb_free.restype = None
            lib.vs_btcdb_free.argtypes = [ctypes.c_void_p]
            lib.vs_btcdb_add.restype = None
            lib.vs_btcdb_add.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.vs_btcdb_search.restype = ctypes.c_int64
            lib.vs_btcdb_search.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p]
        except AttributeError:  # stale .so without btcdb
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _field_desc(arr: np.ndarray, *names):
    """(byte offset, type code) of the first present field, or (-1, 0)."""
    for n in names:
        if n in (arr.dtype.names or ()):
            off = arr.dtype.fields[n][1]
            code = _TYPE_CODES.get(arr.dtype.fields[n][0].str[1:])
            if code is not None:
                return off, code
    return -1, 0


def decode_structured(arr: np.ndarray, time_fields=("time",),
                      t_scale: float = 1.0, t_absolute: bool = False,
                      blind: float = 0.5, point_filter_num: int = 1,
                      max_offset: float = 0.11):
    """Native decode of one scan's structured record array. Returns
    (points (N,3) f32, offsets (N,) f32, intensity (N,) f32) sorted by
    offset, or None when the native library is unavailable or the
    layout has no contiguous x/y/z fields."""
    lib = get_lib()
    if lib is None or arr.dtype.names is None:
        return None
    ox, tx = _field_desc(arr, "x")
    oy, ty = _field_desc(arr, "y")
    oz, tz = _field_desc(arr, "z")
    if ox < 0 or oy < 0 or oz < 0:
        return None
    ot, tt = _field_desc(arr, *time_fields)
    oi, ti = _field_desc(arr, "intensity", "reflectivity")
    raw = np.ascontiguousarray(arr)
    n = len(raw)
    out_xyz = np.empty((n, 3), np.float32)
    out_off = np.empty((n,), np.float32)
    out_int = np.empty((n,), np.float32)
    m = lib.vs_decode(
        raw.ctypes.data, n, raw.dtype.itemsize,
        ox, tx, oy, ty, oz, tz,
        ot, tt, float(t_scale), int(bool(t_absolute)),
        oi, ti,
        float(blind), int(point_filter_num), float(max_offset),
        out_xyz.ctypes.data, out_off.ctypes.data, out_int.ctypes.data)
    return out_xyz[:m].copy(), out_off[:m].copy(), out_int[:m].copy()


def yaw_times(xyz: np.ndarray, omega_deg_s: float = 3610.0):
    """Velodyne yaw-derived time fallback (native)."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, np.float32)
    out = np.empty((len(pts),), np.float32)
    lib.vs_yaw_times(pts.ctypes.data, len(pts), float(omega_deg_s),
                     out.ctypes.data)
    return out


def voxel_downsample_host(xyz: np.ndarray, voxel: float,
                          cap: int = 1 << 20):
    """Native centroid voxel downsample for host-side merges."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, np.float32)
    out = np.empty((min(cap, len(pts)), 3), np.float32)
    m = lib.vs_voxel_downsample(pts.ctypes.data, len(pts), float(voxel),
                                min(cap, len(pts)), out.ctypes.data)
    return out[:m].copy()


# per-sensor decode plans for the prefetching loader (same rules as the
# decoders' native fast path; types needing unit auto-detection or the
# yaw-time fallback use the Python path instead)
LOADER_PLANS = {
    "livox": dict(time_fields="offset_time", t_scale=1e-9, t_absolute=False),
    "ouster": dict(time_fields="t", t_scale=1e-9, t_absolute=False),
    "hesai": dict(time_fields="timestamp", t_scale=1.0, t_absolute=True),
    "robosense": dict(time_fields="timestamp", t_scale=1.0, t_absolute=True),
    "tartanair": dict(time_fields="", t_scale=1.0, t_absolute=False),
}


class ScanLoader:
    """Prefetching dataset scan reader backed by the C++ producer thread
    (loader.cpp): .npy scan files are read, decoded, filtered, and
    time-sorted ahead of consumption, overlapping host IO with device
    compute — the recorded-dataset equivalent of the reference's ROS
    subscriber threads feeding `sync_packages` (voxelslam.hpp:52-177).

    rows: [(t_beg, t_end, abs_path)]; point_cap bounds the copy-out
    buffers. Iterate to get dicts(points, offsets, t_beg, t_end).
    Decode-failed files raise (matching the strict Python path).
    """

    def __init__(self, rows, lidar_type: str, blind: float = 0.5,
                 point_filter_num: int = 1, max_offset: float = 0.11,
                 prefetch: int = 4, point_cap: int = 1 << 20):
        lib = get_lib()
        if lib is None or not hasattr(lib, "vs_loader_open"):
            raise RuntimeError("native loader unavailable")
        plan = LOADER_PLANS.get(lidar_type.lower())
        if plan is None:
            raise RuntimeError(f"no native plan for {lidar_type}")
        self._lib = lib
        index = "\n".join(f"{tb:.17g} {te:.17g} {path}"
                          for tb, te, path in rows)
        self._h = lib.vs_loader_open(
            index.encode(), plan["time_fields"].encode(),
            float(plan["t_scale"]), int(plan["t_absolute"]), float(blind),
            int(point_filter_num), float(max_offset), int(prefetch))
        if not self._h:
            raise RuntimeError("vs_loader_open failed")
        self._cap = point_cap
        self._xyz = np.empty((point_cap, 3), np.float32)
        self._off = np.empty((point_cap,), np.float32)

    def __len__(self):
        return int(self._lib.vs_loader_count(self._h))

    def __iter__(self):
        return self

    def __next__(self):
        import ctypes as ct
        tb = ct.c_double()
        te = ct.c_double()
        m = self._lib.vs_loader_next(
            self._h, self._xyz.ctypes.data, self._off.ctypes.data,
            self._cap, ct.byref(tb), ct.byref(te))
        if m == -1:
            raise StopIteration
        if m == -2:
            raise IOError(f"native loader: decode failed for scan at "
                          f"t=[{tb.value}, {te.value}]")
        pts = self._xyz[:m].copy()
        offs = self._off[:m].copy()
        if m == 0:
            # reference inserts dummy points for empty scans
            # (voxelslam.hpp:82)
            pts = np.zeros((2, 3), np.float32)
            offs = np.zeros(2, np.float32)
        return dict(points=pts, offsets=offs,
                    t_beg=tb.value, t_end=te.value)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vs_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class BtcDb:
    """Native triangle-descriptor hash (btcdb.cpp) — the host half of
    the reference's STDescManager DB. Raises RuntimeError when the
    native toolchain is unavailable (callers fall back to the Python
    dict implementation in loop/btc.py)."""

    def __init__(self, side_quant: float, code_len: int):
        lib = get_lib()
        if lib is None or not hasattr(lib, "vs_btcdb_new"):
            raise RuntimeError("native btcdb unavailable")
        self._lib = lib
        self._quant = float(side_quant)
        self._code_len = int(code_len)
        self._h = lib.vs_btcdb_new(self._quant, self._code_len)
        if not self._h:
            raise RuntimeError("vs_btcdb_new failed")

    def add(self, frame_id: int, sides: np.ndarray, codes: np.ndarray,
            valid: np.ndarray) -> None:
        n = len(sides)
        s = np.ascontiguousarray(sides, np.float32)
        c = np.ascontiguousarray(codes.reshape(n, -1), np.float32)
        assert c.shape[1] == self._code_len, (c.shape, self._code_len)
        v = np.ascontiguousarray(valid, np.uint8)
        self._lib.vs_btcdb_add(self._h, int(frame_id), n,
                               s.ctypes.data, c.ctypes.data, v.ctypes.data)

    def search(self, sides: np.ndarray, codes: np.ndarray,
               valid: np.ndarray, skip_near: int, current_frame: int,
               binary_thr: float, min_votes: int, max_matches: int,
               max_out: int = 64):
        """[(frame, votes, [(q_tri, t_tri), ...])] sorted by votes."""
        n = len(sides)
        s = np.ascontiguousarray(sides, np.float32)
        c = np.ascontiguousarray(codes.reshape(n, -1), np.float32)
        v = np.ascontiguousarray(valid, np.uint8)
        out_f = np.empty(max_out, np.int64)
        out_v = np.empty(max_out, np.int64)
        out_k = np.empty(max_out, np.int64)
        out_p = np.empty((max_out, max_matches, 2), np.int32)
        m = self._lib.vs_btcdb_search(
            self._h, n, s.ctypes.data, c.ctypes.data, v.ctypes.data,
            int(skip_near), int(current_frame), float(binary_thr),
            int(min_votes), int(max_matches), int(max_out),
            out_f.ctypes.data, out_v.ctypes.data, out_k.ctypes.data,
            out_p.ctypes.data)
        return [(int(out_f[i]), int(out_v[i]),
                 [tuple(map(int, p)) for p in out_p[i, :out_k[i]]])
                for i in range(m)]

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vs_btcdb_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
