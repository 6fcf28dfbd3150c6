"""Fixed-capacity open-addressing hash for integer voxel keys.

Replaces the reference's pointer-based `unordered_map<VOXEL_LOC, OctoTree*>`
(tools.hpp:24-49, voxel_map.hpp:1896 in the reference tree) with a
static-shape table that lives on device:

  * keys   (C, 3) int32 voxel coordinates
  * occ    (C,)   bool

Lookups are fixed-round linear probing (gather-only). Inserts elect one
winner per contested slot with a scatter-min, so a whole scan's worth of
new voxels is inserted in MAX_PROBES batched rounds — no host round-trip,
no data-dependent shapes. Slots are never deleted in place (eviction is a
rebuild/compaction pass), so probe chains stay valid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_PROBES = 16
# First rounds run unrolled (straight-line, fully fused); the
# while-loop only mops up stragglers. On TPU each while-loop round
# pays op-dispatch overhead that dwarfs the [Q]-sized body, and with a
# healthy load factor almost every query resolves in <= 2 rounds, so
# the loop usually executes zero iterations.
UNROLL = 2
EMPTY_KEY = jnp.iinfo(jnp.int32).min  # sentinel stored in keys[:, 0] when free


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
    h = h ^ (k[..., 1] * jnp.uint32(19349669))
    h = h ^ (k[..., 2] * jnp.uint32(83492791))
    h = h * jnp.uint32(2654435761)
    return (h % jnp.uint32(capacity)).astype(jnp.int32)


def empty_table(capacity: int):
    keys = jnp.full((capacity, 3), EMPTY_KEY, jnp.int32)
    occ = jnp.zeros((capacity,), jnp.bool_)
    return keys, occ


def lookup(table_keys: jnp.ndarray, occ: jnp.ndarray,
           queries: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Find slots for query keys. queries: (Q, 3); valid: (Q,) bool.

    Returns (Q,) int32 slot ids, -1 where absent/invalid. Probing stops
    logically at the first empty slot (no deletions => chain intact).
    """
    C = table_keys.shape[0]
    h0 = hash_key(queries, C)

    def body(state):
        r, slot, done = state
        cand = (h0 + r) % C
        k = table_keys[cand]
        o = occ[cand]
        hit = o & jnp.all(k == queries, axis=-1)
        miss_empty = ~o
        slot = jnp.where(~done & hit, cand, slot)
        done = done | hit | miss_empty
        return r + 1, slot, done

    def cond(state):
        r, slot, done = state
        # early exit: almost every query resolves in round 1-2, so the
        # data-dependent trip count beats unrolling MAX_PROBES rounds of
        # table gathers ~8x on real scans
        return (r < MAX_PROBES) & ~jnp.all(done)

    slot = jnp.full(queries.shape[:-1], -1, jnp.int32)
    done = ~valid
    state = (jnp.int32(0), slot, done)
    for _ in range(UNROLL):
        state = body(state)
    _, slot, _ = jax.lax.while_loop(cond, body, state)
    return slot


def lookup_multi(tables, queries, valids):
    """Probe SEVERAL tables in one fused loop.

    tables: list of (table_keys, occ); queries/valids: matching lists of
    (Q, 3)/(Q,) arrays. Returns a list of (Q,) slot arrays. Equivalent
    to `lookup` per table in a single while-loop.

    NOTE (measured on TPU, full scan step): fusing the map's 3
    descent-gated per-level probes through this was SLOWER than three
    separate loops (40.4 vs 38.9 ms/scan) — the descend mask empties at
    deeper levels so per-level loops exit after fewer rounds than one
    loop paying max-rounds across levels. Kept for callers whose
    per-table query sets don't shrink.
    """
    L = len(tables)
    caps = [tk.shape[0] for tk, _ in tables]
    h0s = [hash_key(q, c) for (q, c) in zip(queries, caps)]

    def body(state):
        r, slots, dones = state
        new_slots, new_dones = [], []
        for l in range(L):
            tk, oc = tables[l]
            cand = (h0s[l] + r) % caps[l]
            k = tk[cand]
            o = oc[cand]
            hit = o & jnp.all(k == queries[l], axis=-1)
            slot = jnp.where(~dones[l] & hit, cand, slots[l])
            done = dones[l] | hit | ~o
            new_slots.append(slot)
            new_dones.append(done)
        return r + 1, tuple(new_slots), tuple(new_dones)

    def cond(state):
        r, slots, dones = state
        done_all = jnp.all(dones[0])
        for l in range(1, L):
            done_all = done_all & jnp.all(dones[l])
        return (r < MAX_PROBES) & ~done_all

    slots0 = tuple(jnp.full(q.shape[:-1], -1, jnp.int32) for q in queries)
    dones0 = tuple(~v for v in valids)
    state = (jnp.int32(0), slots0, dones0)
    for _ in range(UNROLL):
        state = body(state)
    _, slots, _ = jax.lax.while_loop(cond, body, state)
    return list(slots)


def insert(table_keys: jnp.ndarray, occ: jnp.ndarray,
           queries: jnp.ndarray, valid: jnp.ndarray):
    """Insert (deduplicated!) keys; returns (table_keys, occ, slots).

    queries must not contain duplicate keys among valid rows — dedup is
    the caller's job (scan-level dedup in the voxel map). Keys already in
    the table resolve to their existing slot. Rows that exhaust
    MAX_PROBES (table overfull) return slot -1 and are dropped by the
    caller; keep load factor < ~0.5.

    Because the queries are deduplicated, no query can ever hit a key
    written by ANOTHER query of this same insert — so all key/occ writes
    are deferred to ONE scatter after the probe loop. The loop carries
    only a (C,) `claimed` bitmap (slots won this insert probe past it
    like occupied ones), never the key table itself: the per-round
    (C, 3) table rewrite was the dominant cost of the old formulation.
    """
    C = table_keys.shape[0]
    Q = queries.shape[0]
    h0 = hash_key(queries, C)
    qidx = jnp.arange(Q, dtype=jnp.int32)

    def body(state):
        r, slot, done, claimed = state
        cand = (h0 + r) % C
        k = table_keys[cand]
        o = occ[cand]
        hit = o & jnp.all(k == queries, axis=-1) & ~done
        slot = jnp.where(hit, cand, slot)
        done = done | hit

        # claim empty slots: elect one winner per contested free slot.
        # barrier: election indices and updates share the `want`
        # producer chain — fusing it into two operands of one scatter
        # trips the XLA:TPU fusion assertion (scatter_emitter.cc)
        want = ~done & ~o & ~claimed[cand]
        e_idx, e_upd = jax.lax.optimization_barrier(
            (jnp.where(want, cand, C - 1), jnp.where(want, qidx, Q)))
        election = jnp.full((C,), Q, jnp.int32).at[e_idx].min(
            e_upd, mode="drop")
        won = want & (election[cand] == qidx)
        claimed = claimed.at[jnp.where(won, cand, C)].set(True, mode="drop")
        slot = jnp.where(won, cand, slot)
        done = done | won
        return r + 1, slot, done, claimed

    def cond(state):
        r, slot, done, claimed = state
        # early exit: almost every query resolves in round 1-2
        return (r < MAX_PROBES) & ~jnp.all(done)

    slot0 = jnp.full((Q,), -1, jnp.int32)
    done0 = ~valid
    claimed0 = jnp.zeros((C,), jnp.bool_)
    state = (jnp.int32(0), slot0, done0, claimed0)
    for _ in range(UNROLL):
        state = body(state)
    _, slot, _, claimed = jax.lax.while_loop(cond, body, state)

    # single deferred write of all newly claimed slots. The barrier keeps
    # the shared (slot, queries) producer chain from being fused into two
    # operands of one scatter — that trips an XLA:TPU fusion-pass
    # assertion (scatter_emitter.cc ShouldFuseInputIntoScatter).
    new = (slot >= 0) & claimed[jnp.maximum(slot, 0)]
    tgt = jnp.where(new, slot, C)
    tgt, upd = jax.lax.optimization_barrier((tgt, queries))
    table_keys = table_keys.at[tgt].set(upd, mode="drop")
    occ = occ.at[tgt].set(True, mode="drop")
    return table_keys, occ, slot


def insert_multi(tables, queries, valids):
    """`insert` over SEVERAL tables with one fused probe loop. queries
    must be per-table deduplicated. Returns a list of
    (table_keys, occ, slots) triples. Same measured caveat as
    `lookup_multi`: the map's per-level inserts are faster as separate
    loops (43.1 ms/scan fused vs 38.9 separate, full scan step)."""
    L = len(tables)
    caps = [tk.shape[0] for tk, _ in tables]
    Qs = [q.shape[0] for q in queries]
    h0s = [hash_key(q, c) for (q, c) in zip(queries, caps)]
    qidxs = [jnp.arange(Q, dtype=jnp.int32) for Q in Qs]

    def body(state):
        r, slots, dones, claimeds = state
        n_slots, n_dones, n_claimeds = [], [], []
        for l in range(L):
            tk, oc = tables[l]
            C, Q = caps[l], Qs[l]
            cand = (h0s[l] + r) % C
            k = tk[cand]
            o = oc[cand]
            hit = o & jnp.all(k == queries[l], axis=-1) & ~dones[l]
            slot = jnp.where(hit, cand, slots[l])
            done = dones[l] | hit
            want = ~done & ~o & ~claimeds[l][cand]
            e_idx, e_upd = jax.lax.optimization_barrier(
                (jnp.where(want, cand, C - 1), jnp.where(want, qidxs[l], Q)))
            election = jnp.full((C,), Q, jnp.int32).at[e_idx].min(
                e_upd, mode="drop")
            won = want & (election[cand] == qidxs[l])
            claimed = claimeds[l].at[jnp.where(won, cand, C)].set(
                True, mode="drop")
            slot = jnp.where(won, cand, slot)
            done = done | won
            n_slots.append(slot)
            n_dones.append(done)
            n_claimeds.append(claimed)
        return r + 1, tuple(n_slots), tuple(n_dones), tuple(n_claimeds)

    def cond(state):
        r, slots, dones, claimeds = state
        done_all = jnp.all(dones[0])
        for l in range(1, L):
            done_all = done_all & jnp.all(dones[l])
        return (r < MAX_PROBES) & ~done_all

    slots0 = tuple(jnp.full((Q,), -1, jnp.int32) for Q in Qs)
    dones0 = tuple(~v for v in valids)
    claimeds0 = tuple(jnp.zeros((c,), jnp.bool_) for c in caps)
    state = (jnp.int32(0), slots0, dones0, claimeds0)
    for _ in range(UNROLL):
        state = body(state)
    _, slots, _, claimeds = jax.lax.while_loop(cond, body, state)

    out = []
    for l in range(L):
        tk, oc = tables[l]
        C = caps[l]
        new = (slots[l] >= 0) & claimeds[l][jnp.maximum(slots[l], 0)]
        tgt = jnp.where(new, slots[l], C)
        tgt, upd = jax.lax.optimization_barrier((tgt, queries[l]))
        out.append((tk.at[tgt].set(upd, mode="drop"),
                    oc.at[tgt].set(True, mode="drop"), slots[l]))
    return out


def dedup_keys(keys: jnp.ndarray, valid: jnp.ndarray, unique_max: int):
    """Deduplicate (N, 3) int32 keys -> (unique_max, 3) padded uniques.

    Returns (uniq_keys, uniq_valid, inverse) where inverse (N,) maps each
    input row to its unique row (or -1 if input invalid / overflow).
    Fixed shapes throughout: lexsort + neighbor-compare + bounded scatter.

    The sort is keyed primarily by a HASH of the voxel key (ties broken
    by the raw components, so equal keys stay adjacent): when the input
    has more uniques than `unique_max`, the overflow then drops a
    spatially UNIFORM pseudo-random subset instead of everything past a
    lexicographic cutoff (which would silently discard one side of the
    scene).
    """
    N = keys.shape[0]
    big = jnp.where(valid[:, None], keys, jnp.iinfo(jnp.int32).max)
    h = hash_key(big, 1 << 30)
    h = jnp.where(valid, h, jnp.iinfo(jnp.int32).max)
    order = jnp.lexsort((big[:, 2], big[:, 1], big[:, 0], h))
    sk = big[order]
    first = jnp.concatenate([
        jnp.array([True]),
        jnp.any(sk[1:] != sk[:-1], axis=-1),
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
