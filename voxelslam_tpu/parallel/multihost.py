"""Multi-host orchestration for the distributed GBA fleet.

The sharded bottom-up GBA (`parallel.dist_gba.make_window_fleet`) is
host-count agnostic: `shard_map` over a Mesh built from
`jax.devices()` spans every addressable device once the JAX
distributed runtime is initialized. This module is the thin entry
point that brings a multi-host TPU slice (or a GPU/CPU cluster) into
that state and hands back the global "win" mesh — the moral
equivalent of the reference's single-process thread pool growing into
`jax.distributed` (SURVEY.md section 7.1 stage 11).

Single-host (or already-initialized) processes pass straight through,
so `SlamSystem` can call `global_win_mesh()` unconditionally.

Environment: on Cloud TPU slices `jax.distributed.initialize()`
auto-discovers coordinator/process counts from the TPU metadata; on
other clusters pass coordinator_address/num_processes/process_id
explicitly (mirrors `jax.distributed.initialize`'s contract).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

_initialized = False


def ensure_distributed(coordinator_address: str | None = None,
                       num_processes: int | None = None,
                       process_id: int | None = None) -> bool:
    """Initialize the JAX distributed runtime once per process.

    Returns True when a multi-process runtime is active (or was already
    active), False for plain single-process operation. Safe to call
    repeatedly; a failed auto-discovery (no cluster environment)
    degrades to single-process without raising."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return jax.process_count() > 1
    if coordinator_address is None and num_processes is None:
        # no explicit cluster spec: try TPU-pod auto-discovery only when
        # it cannot break single-host runs
        try:
            import os
            if not any(k in os.environ for k in
                       ("COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                        "MEGASCALE_COORDINATOR_ADDRESS")):
                return False
            jax.distributed.initialize()
        except Exception:
            return False
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def global_win_mesh(min_devices: int = 2) -> Mesh | None:
    """A 1-D "win" mesh over ALL addressable devices of ALL processes
    (after `ensure_distributed`), or None below `min_devices` — the
    mesh `HbaRunner(mesh=...)` shards bottom-up GBA windows over.

    Window batches must be padded to a multiple of the GLOBAL device
    count (HbaRunner's fleet batching already does this)."""
    devs = jax.devices()
    if len(devs) < min_devices:
        return None
    return Mesh(np.array(devs), ("win",))
