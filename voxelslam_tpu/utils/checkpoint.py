"""Mid-run checkpoint/resume of the live SLAM pipeline state.

The reference persists sessions only at finish (per-scan PCDs +
alidarState.txt + edge.txt, voxelslam.cpp:166-279 in the reference
tree); there is no mid-run snapshot of live state (SURVEY.md section
5.4). For long TPU runs we add one: the full mutable state of the
odometry pipeline, loop pipeline, and GBA runner is captured to a
single file and restored into freshly constructed objects, after which
processing continues bit-for-bit (same backend) from the snapshot
point.

Mechanics: each object's __dict__ is filtered (jitted callables,
config-derived constants, and caches are re-created by __init__),
device arrays are pulled to host numpy, and the result is pickled.
On restore the arrays re-land on device lazily at the next jit call.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax

FORMAT_VERSION = 3   # v3: VoxelLevel touched-slot lists (tsl)
                     # v2: VoxelLevel noise records win_nv/fix_nv (NV=5)

# attributes that are reconstructed by __init__ and must NOT be
# serialized (jitted callables capture tracers/devices; caches are
# rebuilt; cfg comes from the constructor)
_SKIP_PREFIXES = ("_jit",)
_SKIP_KEYS = {
    "cfg", "btc_cfg", "noise_meas", "noise_walk", "R_ext", "t_ext",
    "collect_clouds", "_pg_cache", "_step_cache", "_extract",
    "kf_point_max", "_capacity", "_unique_max",
    # distributed-GBA runtime objects: the mesh references live devices
    # and the fleet cache holds jitted callables — both reconstructed
    "mesh", "_fleet_cache", "_fleet_batch",
}


def _is_state_key(k: str) -> bool:
    if k in _SKIP_KEYS:
        return False
    return not any(k.startswith(p) for p in _SKIP_PREFIXES)


def _to_host(v):
    """Recursively convert jax arrays (incl. inside registered pytrees,
    lists, dicts) to numpy; plain python / numpy passes through."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, v)


def _state_dict(obj) -> dict:
    return {k: _to_host(v) for k, v in vars(obj).items() if _is_state_key(k)}


def _load_state(obj, d: dict) -> None:
    for k, v in d.items():
        setattr(obj, k, v)


def save_system(system, path: str) -> None:
    """Snapshot a `SlamSystem` (odometry + loop + GBA state) to `path`."""
    blob = {
        "version": FORMAT_VERSION,
        "odom": _state_dict(system.odom),
        "loop": _state_dict(system.loop) if system.loop is not None else None,
        "gba": _state_dict(system.gba) if system.gba is not None else None,
        "system": {k: _to_host(v) for k, v in vars(system).items()
                   if k in ("session_names", "_gba_consumed", "_emitted",
                            "_session", "corrections", "savepath")},
    }
    with open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_system(system, path: str) -> None:
    """Restore a snapshot into a freshly constructed `SlamSystem` with
    the SAME config / enable flags it was saved with."""
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {blob['version']} != "
                         f"{FORMAT_VERSION}")
    _load_state(system.odom, blob["odom"])
    if blob["loop"] is not None:
        if system.loop is None:
            raise ValueError("checkpoint has loop state but system was "
                             "built with enable_loop=False")
        _load_state(system.loop, blob["loop"])
    if blob["gba"] is not None:
        if system.gba is None:
            raise ValueError("checkpoint has GBA state but system was "
                             "built with enable_gba=False")
        _load_state(system.gba, blob["gba"])
    _load_state(system, blob["system"])
