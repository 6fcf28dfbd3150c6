"""Fixed-capacity open-addressing hash for integer voxel keys.

Replaces the reference's pointer-based `unordered_map<VOXEL_LOC, OctoTree*>`
(tools.hpp:24-49, voxel_map.hpp:1896 in the reference tree) with a
static-shape table that lives on device:

  * keys   (C, 3) int32 voxel coordinates
  * occ    (C,)   bool

Probing is QUADRATIC (triangular offsets h0, h0+1, h0+3, h0+6, ... mod C,
which visit distinct slots for power-of-two C): linear probing's primary
clustering produced 15-long chains at 0.36 load in real maps; triangular
offsets keep chains geometric. Chains are hard-capped at PROBES=8 —
inserts past 8 collisions drop the key (graceful sparsification, rare
below ~0.5 load; eviction keeps tables below that), which lets every
probe loop run STRAIGHT-LINE (no `lax.while_loop`, no all-done reduction
per round — measured ~0.3 ms of fixed overhead per while round on TPU).

Insert elections use a single carried (C,) int32 `election` array with
round-tagged scatter-min (tag = round * Q + query_idx): one winner per
contested slot per round, earlier-round claims keep smaller tags so later
rounds can never steal — per-round work is O(Q) gathers + one O(#active)
scatter, never O(C). Slots are never deleted in place (eviction is a
rebuild/compaction pass), so probe chains stay valid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Hard cap on probe-chain length. Insert and lookup MUST agree on this
# (a key stored at triangular offset r is only visible to lookups
# scanning >= r+1 rounds).
PROBES = 8
# kept for callers/tests that referenced the old knob
MAX_PROBES = PROBES
EMPTY_KEY = jnp.iinfo(jnp.int32).min  # sentinel stored in keys[:, 0] when free
_INIT_TAG = jnp.iinfo(jnp.int32).max


def voxel_key(points: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """World points (..., 3) -> integer voxel coords (..., 3) int32.

    Matches the reference's floor-toward-negative binning
    (tools.hpp:207-216: loc -= 1.0 for negative coords + int truncation).
    """
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def hash_key(keys: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Mix (..., 3) int32 coords into table indices [0, capacity).

    Multiplicative mixing in uint32 (same spirit as the reference's
    ((z*P)%N + y)*P%N + x with P=116101, tools.hpp:46, but using odd
    constants that mix well in 32-bit)."""
    k = keys.astype(jnp.uint32)
    h = k[..., 0] * jnp.uint32(73856093)
    h = h + (k[..., 1] * jnp.uint32(19349669))
    h = h + (k[..., 2] * jnp.uint32(83492791))
    # murmur3-style finalizer: the bare xor/product mix collided whole
    # lattice neighborhoods onto one 32-bit hash (observed 4 distinct
    # in-scan voxel keys with IDENTICAL h — a depth-4 probe-contention
    # chain); the avalanche kills that structure
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(capacity)).astype(jnp.int32)


def _cand(h0: jnp.ndarray, r, capacity: int) -> jnp.ndarray:
    """Probe candidate for round r: triangular offset r(r+1)/2."""
    return (h0 + (r * (r + 1)) // 2) % capacity


# round indices for batched candidate generation (numpy: no device
# constant materialized at import time)
import numpy as _np  # noqa: E402
_ROUNDS = _np.arange(PROBES, dtype=_np.int32)


def empty_table(capacity: int):
    keys = jnp.full((capacity, 3), EMPTY_KEY, jnp.int32)
    occ = jnp.zeros((capacity,), jnp.bool_)
    return keys, occ


def lookup(table_keys: jnp.ndarray, occ: jnp.ndarray,
           queries: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Find slots for query keys. queries: (Q, 3); valid: (Q,) bool.

    Returns (Q,) int32 slot ids, -1 where absent/invalid. Straight-line:
    checks all PROBES candidates (a stored key occupies exactly one slot
    of its probe sequence, so "first hit" needs no early-exit logic, and
    the unrolled gathers fuse into the surrounding graph). Occupancy is
    implied by the EMPTY_KEY sentinel in the gathered keys — `occ` is
    NOT gathered on this hot path (free slots can never equal a real
    voxel key; probe gathers are a top per-scan cost)."""
    del occ  # occupancy implied by the key sentinel
    C = table_keys.shape[0]
    h0 = hash_key(queries, C)
    # ONE (Q, PROBES) gather for all candidate rounds (the table is
    # static during probing): the 8-way unrolled per-round gathers were
    # 8 separate ~25 us device ops per lookup — the probe gathers were
    # the largest remaining C-table op group in the fused scan step
    cands = _cand(h0[..., None], _ROUNDS, C)          # (Q, PROBES)
    k = table_keys[cands]                             # (Q, PROBES, 3)
    hit = jnp.all(k == queries[..., None, :], axis=-1)
    r_first = jnp.argmax(hit, axis=-1)
    slot = jnp.take_along_axis(cands, r_first[..., None], -1)[..., 0]
    return jnp.where(valid & jnp.any(hit, axis=-1), slot, -1)


def insert(table_keys: jnp.ndarray, occ: jnp.ndarray,
           queries: jnp.ndarray, valid: jnp.ndarray):
    """Insert (deduplicated!) keys; returns (table_keys, occ, slots).

    queries must not contain duplicate keys among valid rows — dedup is
    the caller's job (scan-level dedup in the voxel map). Keys already in
    the table resolve to their existing slot. Rows whose probe chain
    exhausts PROBES (or lose every election) return slot -1 and are
    dropped by the caller; keep load factor < ~0.5.

    Because the queries are deduplicated, no query can ever hit a key
    written by ANOTHER query of this same insert — so all key/occ writes
    are deferred to ONE scatter, and existing-key hits resolve from one
    batched (Q, PROBES) candidate gather up-front. Free-slot claims run
    sequential per-round scatter-min elections over the same
    precomputed candidates (tag r*Q + qidx; earlier rounds can never be
    stolen).
    """
    C = table_keys.shape[0]
    Q = queries.shape[0]
    h0 = hash_key(queries, C)
    qidx = jnp.arange(Q, dtype=jnp.int32)

    # ONE (Q, PROBES) key gather for every round (see lookup): existing-
    # key hits can be resolved up-front because occupancy is monotone —
    # if a key sits at round r, rounds < r were occupied at its own
    # insert time and slots are never freed in place, so a hit at r can
    # never race a claim at r' < r
    cands = _cand(h0[:, None], _ROUNDS, C)            # (Q, PROBES)
    ks = table_keys[cands]                            # (Q, PROBES, 3)
    occ_r = ks[..., 0] != EMPTY_KEY                   # (Q, PROBES)
    hits = occ_r & jnp.all(ks == queries[:, None, :], axis=-1)
    any_hit = jnp.any(hits, axis=-1) & valid
    r_hit = jnp.argmax(hits, axis=-1)
    hit_slot = jnp.take_along_axis(cands, r_hit[:, None], 1)[:, 0]

    slot = jnp.where(any_hit, hit_slot, -1)
    done = ~valid | any_hit
    election = jnp.full((C,), _INIT_TAG, jnp.int32)

    # sequential free-slot election rounds over the precomputed
    # candidates (a flattened Q*PROBES single-scatter variant was tried
    # and regressed: computed-index scatters of Q*8 rows serialize on
    # TPU, same lesson as the r4 insert bisect). Claim state lives in
    # one carried (C,) `election` array: round r writes tag r*Q + qidx
    # with scatter-min; earlier rounds' tags are smaller, so a claim
    # can never be stolen by a later round.
    for r in range(PROBES):
        cand = cands[:, r]
        # barrier: election indices and updates share the `want`
        # producer chain — fusing it into two operands of one scatter
        # trips the XLA:TPU fusion assertion (scatter_emitter.cc)
        tag = r * Q + qidx
        want = ~done & ~occ_r[:, r] & (election[cand] == _INIT_TAG)
        e_idx, e_upd = jax.lax.optimization_barrier(
            (jnp.where(want, cand, C), jnp.where(want, tag, _INIT_TAG)))
        election = election.at[e_idx].min(e_upd, mode="drop")
        won = want & (election[cand] == tag)
        slot = jnp.where(won, cand, slot)
        done = done | won

    # single deferred write of all newly claimed slots. The barrier keeps
    # the shared (slot, queries) producer chain from being fused into two
    # operands of one scatter (XLA:TPU scatter_emitter.cc assertion).
    new = (slot >= 0) & ~occ[jnp.maximum(slot, 0)]
    tgt = jnp.where(new, slot, C)
    tgt, upd = jax.lax.optimization_barrier((tgt, queries))
    table_keys = table_keys.at[tgt].set(upd, mode="drop")
    occ = occ.at[tgt].set(True, mode="drop")
    return table_keys, occ, slot


def dedup_keys(keys: jnp.ndarray, valid: jnp.ndarray, unique_max: int):
    """Deduplicate (N, 3) int32 keys -> (unique_max, 3) padded uniques.

    Returns (uniq_keys, uniq_valid, inverse) where inverse (N,) maps each
    input row to its unique row (or -1 if input invalid / overflow).
    Fixed shapes throughout: sort + neighbor-compare + bounded scatter.

    The sort is keyed primarily by a HASH of the voxel key: when the
    input has more uniques than `unique_max`, the overflow drops a
    spatially UNIFORM pseudo-random subset instead of everything past a
    lexicographic cutoff (which silently discards one side of the scene
    — keyframe-cloud downsampling overflows routinely and descriptor
    extraction collapses without this). Ties break on (x,y) packed into
    one unsigned key and sign-flipped z, so grouping costs THREE sort
    passes instead of four; equal-key contiguity is exact unless two
    same-hash keys in one batch differ by a multiple of 2^16 in both x
    and y with equal z (impossible within one scan's extent).
    """
    N = keys.shape[0]
    big = jnp.where(valid[:, None], keys, jnp.iinfo(jnp.int32).max)
    h = hash_key(big, 1 << 30)
    h = jnp.where(valid, h, jnp.iinfo(jnp.int32).max)
    xy = ((big[:, 0].astype(jnp.uint32) << 16)
          | (big[:, 1].astype(jnp.uint32) & 0xFFFF))
    zu = big[:, 2].astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    order = jnp.lexsort((zu, xy, h))
    sk = big[order]
    hs, xys, zus = h[order], xy[order], zu[order]
    first = jnp.concatenate([
        jnp.array([True]),
        (hs[1:] != hs[:-1]) | (xys[1:] != xys[:-1]) | (zus[1:] != zus[:-1]),
    ])
    valid_sorted = valid[order]
    first = first & valid_sorted
    # unique id per sorted row (0-based among uniques)
    uid_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    overflow = uid_sorted >= unique_max
    uid_sorted = jnp.where(valid_sorted & ~overflow, uid_sorted, -1)

    # gather unique keys. Barriers: indices and updates of both scatters
    # share the sort-output producers (order/sk/uid_sorted) — fusing one
    # producer into two scatter operands trips an XLA:TPU fusion-pass
    # assertion (scatter_emitter.cc ShouldFuseInputIntoScatter).
    uniq_keys = jnp.full((unique_max, 3), EMPTY_KEY, jnp.int32)
    tgt, sk, order, uid_sorted = jax.lax.optimization_barrier(
        (jnp.where(first & ~overflow, uid_sorted, unique_max), sk, order,
         uid_sorted))
    uniq_keys = uniq_keys.at[tgt].set(sk, mode="drop")
    n_uniq = jnp.sum((first & ~overflow).astype(jnp.int32))
    uniq_valid = jnp.arange(unique_max) < n_uniq

    inverse = jnp.full((N,), -1, jnp.int32).at[order].set(uid_sorted)
    return uniq_keys, uniq_valid, inverse
