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
_SO = os.path.join(_HERE, "libvsingest.so")
_lock = threading.Lock()
_lib = None
_tried = False

# field type codes matching ingest.cpp read_field
_TYPE_CODES = {"f4": 0, "f8": 1, "u4": 2, "i4": 3, "u2": 4, "u1": 5,
               "i8": 6, "u8": 7}


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", _SRC, "-o", _SO]
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
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
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
