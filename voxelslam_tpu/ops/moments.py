"""Per-point voxel moment accumulation (the insert hot kernel).

The scan-insert path must bucket P points' zeroth/first/second moments
and noise records into per-voxel accumulators across all map levels
(reference cut_voxel's per-point push, voxel_map.hpp:1896-2096). As
separate XLA scatter-adds (n, sum p, sum dd^T, nv per level) this is
~18 serializing scatters of P elements each — the single largest group
of the fused scan step's device time.

Here the 16 channels per (point, level) are packed into ONE update row

    upd16 = w * [1, q (3), q q^T packed (6), nv (5), pad]

with q the point coordinate RELATIVE TO ITS VOXEL CENTER (bounded by
the voxel diagonal, so raw second moments stay f32-stable; the caller
re-centers to the scan mean in closed form afterwards), and accumulated
either by

  * a Pallas TPU kernel: per-level accumulators live VMEM-resident,
    packed 8 slots x 16 channels per 128-lane row; one sequential pass
    over points does a dynamic row read-add-write per (point, level) —
    VMEM-speed accumulation instead of serialized HBM scatters; or
  * one consolidated XLA scatter-add per level (CPU & fallback path —
    numerically the same sums, so tests run the identical algorithm).

Both return per-level (C, 16) raw accumulator tables.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 16          # channels per slot (1 + 3 + 6 + 5 + 1 pad)
SLOTS_PER_ROW = 8   # CH * 8 = 128 lanes


def pack_updates(q: jnp.ndarray, nv: jnp.ndarray,
                 w: jnp.ndarray) -> jnp.ndarray:
    """(P,3) voxel-relative coords, (P,5) noise records, (P,) weights ->
    (P, CH) update rows. Symmetric second moment packed as
    (xx, yy, zz, xy, xz, yz)."""
    qq = jnp.stack([q[:, 0] * q[:, 0], q[:, 1] * q[:, 1],
                    q[:, 2] * q[:, 2], q[:, 0] * q[:, 1],
                    q[:, 0] * q[:, 2], q[:, 1] * q[:, 2]], axis=1)
    pad = jnp.zeros((q.shape[0], 1), q.dtype)
    return jnp.concatenate([jnp.ones_like(w)[:, None], q, qq, nv, pad],
                           axis=1) * w[:, None]


def unpack_sym6(m6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) packed symmetric -> (..., 3, 3)."""
    xx, yy, zz, xy, xz, yz = [m6[..., i] for i in range(6)]
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _make_kernel(L: int, P: int):
    def kernel(slots_ref, upd_ref, *accs):
        for a in accs:
            a[:] = jnp.zeros_like(a)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        group = lane // CH                       # sub-slot of each lane

        def body(i, _):
            for l in range(L):
                sl = slots_ref[l, i]
                r = sl // SLOTS_PER_ROW
                s = sl % SLOTS_PER_ROW
                u = upd_ref[l, i, :]                       # (CH,)
                tiled = jnp.tile(u, SLOTS_PER_ROW).reshape(1, 128)
                placed = jnp.where(group == s, tiled, 0.0)
                accs[l][r, :] = accs[l][r, :] + placed[0]
            return 0

        jax.lax.fori_loop(0, P, body, 0)

    return kernel


def accumulate(slots, upds, caps, interpret: bool = False):
    """slots (L, P) int32 in [0, C_l) (invalid points: any in-range slot
    with an all-zero update row); upds (L, P, CH) f32. Returns a list of
    (C_l, CH) f32 raw accumulators.

    TPU: Pallas VMEM kernel. Elsewhere: one scatter-add per level."""
    L, P = slots.shape
    assert upds.shape == (L, P, CH)
    use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas:
        return [jnp.zeros((c, CH), upds.dtype)
                .at[slots[l]].add(upds[l], mode="drop")
                for l, c in enumerate(caps)]

    for c in caps:
        assert c % SLOTS_PER_ROW == 0
    outs = pl.pallas_call(
        _make_kernel(L, P),
        out_shape=tuple(
            jax.ShapeDtypeStruct((c // SLOTS_PER_ROW, 128), upds.dtype)
            for c in caps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * L),
        interpret=interpret,
    )(slots, upds)
    return [o.reshape(c, CH) for o, c in zip(outs, caps)]
