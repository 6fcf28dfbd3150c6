"""Tensorized multi-resolution voxel plane map.

This replaces the reference's adaptive pointer octree `OctoTree`
(voxel_map.hpp:1047-1881 in the reference tree) with `max_layer+1`
fixed-capacity hashed levels. The key structural move for TPU: points
are inserted into *every* level at scan time (batched scatter), so the
reference's `recut` subdivision (voxel_map.hpp:1396-1456) becomes a pure
per-slot re-evaluation — plane fit + state flags — with zero data
movement, and `margi` (voxel_map.hpp:1465-1598) becomes closed-form
moment algebra. Per-voxel state encodes the octree descent:

    state 0: not enough points / not a plane leaf -> match fails here
    state 1: plane leaf -> match against this level's plane
    state 2: non-planar with enough points -> descend to the next level

Window-frame data is stored as *local-frame centered clusters* per
(window-slot, slot) — the SlideWindow equivalent (voxel_map.hpp:1009) —
so BA can re-transform them under pose updates in closed form. The
window axis is MAJOR (leaves are (W, C, ...)): per-scan writes touch one
window slot, and a dynamic-update-slice on the major axis is a
contiguous block write (the (C, W, ...) layout forced a full-array
relayout per scan — the dominant cost of the first implementation).

Plane refresh is incremental, mirroring the reference's semantics: the
reference re-evaluates planes only for octrees that received points
(`recut` over the updated set, voxelslam.cpp:1682-1737) and leaves all
other planes untouched — so do we: `refresh_planes` with `slots` given
re-fits ONLY the voxels touched by this scan; the full-map variant
(slots=None) serves initialization / map rebuild.

Plane parameter covariance: the reference propagates full per-point
covariances through the eigenvector perturbation into a 9x9 moment
covariance per voxel (Bf_var/plane_update, voxel_map.hpp:106-121,
1344-1388). We compress the per-point LiDAR noise model
var = a r r^T + b I (a = dept_err^2 - (beam_err d)^2, b = (beam_err d)^2
— exactly calcBodyVar's structure) into a 5-channel per-voxel
accumulator nv = [sum a*r (3), sum a, sum b], i.e. a rank-1 +
isotropic approximation of sum var_i (exact when the voxel's points
share a viewing direction — true for voxels much smaller than their
range). The plane gate then uses the noise variance ALONG THE NORMAL

    s_n^2 = u0^T (sum var_i) u0 / N ~ ((u0.s)^2/sum_a + sum_b) / N
    cov(normal) ~ s_n^2/N * sum_{k!=0} (l0+lk)/(l0-lk)^2 u_k u_k^T
    cov(center).n ~ s_n^2/N

which is the first-order anisotropic plane uncertainty (plane points
spread in-plane, so the normal perturbation is driven by the noise
component along u0), with O(5) state per (slot, voxel) instead of the
reference's 9x9 accumulator. Isotropic callers may still pass a scalar
per-point trace/3 — it expands to a=0, b=tr (identical to the r2
behavior). The 3-sigma match gate semantics (voxel_map.hpp:1649-1721)
are unchanged.

Everything the point-to-plane `match` needs per voxel is packed into one
(C, SLAB) f32 record (normal, center, radius, precomputed plane-noise
coefficients, state) so one probe resolves to ONE gather.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..config import MapConfig
from ..core import cluster as cl
from ..core.cluster import Cluster
from ..core.eig3 import eigh3
from ..ops import voxel_hash as vh

STATE_NONE = 0
STATE_PLANE = 1
STATE_SUBDIV = 2

# slab columns (match record): one gather serves the whole match gate
SLAB = 16
_S_NORMAL = slice(0, 3)
_S_CENTER = slice(3, 6)
_S_RADIUS = 6
_S_CMEAN = 7      # in-plane-isotropic normal-covariance coefficient
_S_CVAR = 8       # center-variance coefficient sigma^2 / N
_S_STATE = 9      # state as float (exact for 0/1/2)


NV = 5  # noise-record channels: [sum a*rhat (3), sum a, sum b]


@partial(jax.tree_util.register_dataclass,
         data_fields=["keys", "occ", "win", "win_nv", "fix", "fix_nv",
                      "tot", "tot_nv", "state", "slab", "lam", "jour",
                      "tsl"],
         meta_fields=[])
@dataclasses.dataclass
class VoxelLevel:
    keys: jnp.ndarray      # (C, 3) int32
    occ: jnp.ndarray       # (C,) bool
    win: Cluster           # leaves (W, C, ...): local-frame per window slot
    win_nv: jnp.ndarray    # (W, C, NV) noise record, LOCAL frame
    fix: Cluster           # (C, ...): world-frame marginalized points
    fix_nv: jnp.ndarray    # (C, NV) noise record, WORLD frame
    tot: Cluster           # (C, ...): world-frame RUNNING total
    tot_nv: jnp.ndarray    # (C, NV): incrementally merged at insert
                           # (contributions at their insert-time poses)
                           # and RESYNCED to the exact fix + sum_w
                           # transform(win) by every full-table refresh;
                           # the touched-slot refresh fits planes from
                           # this table directly — no (W, C) window
                           # gathers in the per-scan hot path
    state: jnp.ndarray     # (C,) int32
    slab: jnp.ndarray      # (C, SLAB) packed match record
    lam: jnp.ndarray       # (C, 3) eigenvalues of normalized cov
    jour: jnp.ndarray      # (C,) travel-distance stamp at creation
    tsl: jnp.ndarray       # (W, T) int32 touched-slot list per window
                           # slot (sentinel C = unused row; T = the
                           # level's unique_max, or T = 0 = tracking
                           # off). Invariant: win[w] is nonzero ONLY at
                           # slots listed in tsl[w] — maintained by
                           # insert (one scan per cleared slot),
                           # marginalize (clears), evict (remaps).

    # --- derived accessors (kept for tests / introspection) -----------
    @property
    def normal(self) -> jnp.ndarray:
        return self.slab[:, _S_NORMAL]

    @property
    def center(self) -> jnp.ndarray:
        return self.slab[:, _S_CENTER]

    @property
    def radius(self) -> jnp.ndarray:
        return self.slab[:, _S_RADIUS]


def empty_level(capacity: int, win_size: int,
                track_max: int = 0) -> VoxelLevel:
    """track_max: touched-slot list width (= the level's per-scan
    unique_max). 0 disables tracking — marginalize falls back to the
    full-table pass (used by the GBA window maps, which never
    marginalize)."""
    keys, occ = vh.empty_table(capacity)
    C = capacity
    return VoxelLevel(
        keys=keys, occ=occ,
        win=Cluster.empty((win_size, C)),
        win_nv=jnp.zeros((win_size, C, NV)),
        fix=Cluster.empty((C,)),
        fix_nv=jnp.zeros((C, NV)),
        tot=Cluster.empty((C,)),
        tot_nv=jnp.zeros((C, NV)),
        state=jnp.zeros((C,), jnp.int32),
        slab=jnp.zeros((C, SLAB)),
        lam=jnp.zeros((C, 3)),
        jour=jnp.zeros((C,)),
        tsl=jnp.full((win_size, track_max), C, jnp.int32),
    )


def expand_noise(tr_pt: jnp.ndarray) -> jnp.ndarray:
    """Per-point noise records: accept either a scalar isotropic
    trace/3 (N,) — expanded to a=0, b=tr — or a full (N, NV) record
    [a*rhat (3), a, b] from `point_noise_record`."""
    if tr_pt.ndim == 2 and tr_pt.shape[-1] == NV:
        return tr_pt
    z = jnp.zeros(tr_pt.shape + (4,), tr_pt.dtype)
    return jnp.concatenate([z, tr_pt[..., None]], axis=-1)


def point_noise_record(pts_body: jnp.ndarray, dept_err: float,
                       beam_err: float) -> jnp.ndarray:
    """(N, NV) noise record of the LiDAR range/bearing model
    var = a r r^T + b I with a = dept^2 - (beam d)^2, b = (beam d)^2
    (the decomposition of calcBodyVar, voxelslam.hpp:180-200).
    pts_body: (N, 3) sensor/body frame."""
    r = jnp.linalg.norm(pts_body, axis=-1, keepdims=True)
    rhat = pts_body / jnp.maximum(r, 1e-6)
    b = (beam_err * r) ** 2                       # (N, 1)
    a = dept_err ** 2 - b
    return jnp.concatenate([a * rhat, a, b], axis=-1)


def empty_map(cfg: MapConfig):
    return tuple(
        empty_level(c, cfg.win_size,
                    cfg.unique_max[l] if cfg.track_touched else 0)
        for l, c in enumerate(cfg.capacities))


# ---------------------------------------------------------------------------
# Insertion (reference cut_voxel / cut_voxel_multi, voxel_map.hpp:1896-2096)
# ---------------------------------------------------------------------------

def insert_scan_level(lv: VoxelLevel, level_size: float, unique_max: int,
                      pts_world: jnp.ndarray, pts_local: jnp.ndarray,
                      tr_pt: jnp.ndarray, mask: jnp.ndarray,
                      frame_slot, jour, _pre=None):
    """Insert one scan's points into a level at window slot `frame_slot`.

    Returns (level, touched_slots (U,), touched_valid (U,), dropped) —
    the slots that received points, for the incremental plane refresh,
    plus the count of unique keys whose probe chain exhausted PROBES
    (silently sparsified otherwise — callers surface this so load-factor
    pathologies are observable). `_pre` optionally carries precomputed
    (uniq, uvalid, inv, tkeys, occ, uslots)."""
    C = lv.keys.shape[0]
    W = lv.win.n.shape[0]
    if _pre is None:
        keys = vh.voxel_key(pts_world, level_size)
        unique_max = min(unique_max, pts_world.shape[0])
        uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, unique_max)
        occ_before = lv.occ
        tkeys, occ, uslots = vh.insert(lv.keys, lv.occ, uniq, uvalid)
    else:
        uniq, uvalid, inv, tkeys, occ, uslots = _pre
        occ_before = lv.occ
    U = uslots.shape[0]
    T = lv.tsl.shape[1]
    nv_pt = expand_noise(tr_pt)

    if T == 0:
        # --- dense-column path (default): per-point scatter into
        # (C,)-sized stats, whole-column merge, and ONE contiguous
        # dynamic-update-slice write at the major window axis. The
        # "sparse" row-scatter alternative below touches 10x less data
        # but its computed-index scatters into the (W*C) leaves
        # SERIALIZE on TPU — measured ~2x the whole megastep (r04
        # bench): contiguous-dense beats scatter-sparse here.
        pslot = jnp.where(inv >= 0, uslots[jnp.maximum(inv, 0)], -1)
        ok = (mask > 0) & (pslot >= 0)
        # barrier: see insert_fixed_level (scatter fusion assertion)
        seg, w, pslot = jax.lax.optimization_barrier(
            (jnp.where(ok, pslot, C), ok.astype(pts_local.dtype), pslot))
        n_add = jnp.zeros((C,)).at[seg].add(w, mode="drop")
        sum_p = jnp.zeros((C, 3)).at[seg].add(
            pts_local * w[:, None], mode="drop")
        mu_add = sum_p / jnp.maximum(n_add, 1.0)[:, None]
        d = (pts_local - mu_add[jnp.maximum(pslot, 0)]) * w[:, None]
        S_add = jnp.zeros((C, 3, 3)).at[seg].add(
            d[:, :, None] * d[:, None, :], mode="drop")
        nv_add = jnp.zeros((C, NV)).at[seg].add(
            nv_pt * w[:, None], mode="drop")
        added = Cluster(n=n_add, mu=mu_add, S=S_add)
        col = lv.win[frame_slot]
        merged = cl.merge(col, added)
        win = jax.tree.map(lambda full, new: full.at[frame_slot].set(new),
                           lv.win, merged)
        win_nv = lv.win_nv.at[frame_slot].add(nv_add)
        tsl = lv.tsl
    else:
        # --- touched-slot path (opt-in, MapConfig.track_touched): U-row
        # statistics + flat row-scatters + the tsl bookkeeping that
        # enables the sparse marginalize fold
        ok = (mask > 0) & (inv >= 0)
        seg, w = jax.lax.optimization_barrier(
            (jnp.where(ok, inv, U), ok.astype(pts_local.dtype)))
        n_add = jnp.zeros((U,)).at[seg].add(w, mode="drop")
        sum_p = jnp.zeros((U, 3)).at[seg].add(
            pts_local * w[:, None], mode="drop")
        mu_add = sum_p / jnp.maximum(n_add, 1.0)[:, None]
        d = (pts_local - mu_add[jnp.clip(inv, 0, U - 1)]) * w[:, None]
        S_add = jnp.zeros((U, 3, 3)).at[seg].add(
            d[:, :, None] * d[:, None, :], mode="drop")
        nv_add = jnp.zeros((U, NV)).at[seg].add(
            nv_pt * w[:, None], mode="drop")
        added = Cluster(n=n_add, mu=mu_add, S=S_add)

        row_ok = uvalid & (uslots >= 0)
        su = jnp.clip(jnp.where(row_ok, uslots, 0), 0, C - 1)
        flat = frame_slot * C + su
        win_flat = jax.tree.map(
            lambda a: a.reshape((W * C,) + a.shape[2:]), lv.win)
        col_u = jax.tree.map(lambda a: a[flat], win_flat)
        nv_u = lv.win_nv.reshape((W * C, NV))[flat]
        merged = cl.merge(col_u, added)
        nv_new = nv_u + nv_add
        # barrier: see insert_fixed_level (scatter fusion assertion)
        tgt, m_n, m_mu, m_S, nv_new = jax.lax.optimization_barrier(
            (jnp.where(row_ok, flat, W * C), merged.n, merged.mu,
             merged.S, nv_new))
        win_flat = Cluster(
            n=win_flat.n.at[tgt].set(m_n, mode="drop"),
            mu=win_flat.mu.at[tgt].set(m_mu, mode="drop"),
            S=win_flat.S.at[tgt].set(m_S, mode="drop"))
        win = jax.tree.map(lambda a, b: a.reshape(b.shape), win_flat,
                           lv.win)
        win_nv = lv.win_nv.reshape((W * C, NV)).at[tgt].set(
            nv_new, mode="drop").reshape(lv.win_nv.shape)

        row = jnp.where(row_ok, uslots, C)
        if U < T:
            row = jnp.concatenate(
                [row, jnp.full((T - U,), C, jnp.int32)])
        elif U > T:
            # slots beyond T would hold window stats invisible to the
            # sparse marginalize (silently discarded at the column
            # clear). U and T are static — fail loudly instead.
            raise ValueError(
                f"insert_scan_level: scan unique cap U={U} exceeds the "
                f"touched-slot track width T={T}; size tsl to "
                f"unique_max or disable tracking (T=0) for this level")
        tsl = lv.tsl.at[frame_slot].set(row)

    # stamp journey distance on newly created voxels
    newly = uvalid & (uslots >= 0) & ~occ_before[jnp.maximum(uslots, 0)]
    jour_arr = lv.jour.at[jnp.where(newly, uslots, C)].set(
        jnp.float32(jour), mode="drop")

    lv = dataclasses.replace(lv, keys=tkeys, occ=occ, win=win,
                             win_nv=win_nv, jour=jour_arr, tsl=tsl)
    dropped = jnp.sum((uvalid & (uslots < 0)).astype(jnp.int32))
    return lv, uslots, uvalid & (uslots >= 0), dropped


def insert_scan(levels, cfg: MapConfig, pts_world, pts_local, tr_pt, mask,
                frame_slot, jour=0.0):
    levels, _ = insert_scan_touched(levels, cfg, pts_world, pts_local,
                                    tr_pt, mask, frame_slot, jour)
    return levels


def insert_scan_touched(levels, cfg: MapConfig, pts_world, pts_local,
                        tr_pt, mask, frame_slot, jour=0.0):
    """insert_scan + per-level (slots, valid) of the voxels touched.

    Each level runs its own straight-line PROBES-round insert
    (ops.voxel_hash.insert); the dedup sorts and moment scatters are
    data-parallel within a level and independent across levels, so XLA
    overlaps them freely inside the fused scan step."""
    out, touched = [], []
    for l, lv in enumerate(levels):
        lv2, s, sv, dropped = insert_scan_level(
            lv, cfg.level_size(l), cfg.unique_max[l],
            pts_world, pts_local, tr_pt, mask, frame_slot, jour)
        out.append(lv2)
        touched.append((s, sv, dropped))
    return tuple(out), touched


def insert_scan_fused(levels, cfg: MapConfig, pts_world, pts_local,
                      tr_pt, mask, frame_slot, jour, R, p,
                      interpret: bool = False):
    """All-level scan insert with the fused moment-accumulation kernel
    (ops.moments) — the TPU hot path used by the steady megastep.

    Identical semantics to `insert_scan_touched` over dense (untracked)
    levels, but the ~18 per-level scatter-adds of per-point moments are
    replaced by ONE accumulation pass: per-point updates are packed as
    16-channel rows in voxel-center-relative coordinates (f32-stable raw
    moments; re-centered to the scan mean in closed form below) and
    bucketed by a Pallas VMEM kernel (TPU) or one scatter-add per level
    (CPU fallback — same sums, so cross-path parity is testable).

    Requires the scan pose (R, p) to relate world voxel centers to the
    local frame: q = R^T (p_world - center). Tracked levels (tsl) are
    not supported here."""
    from ..ops import moments as mo

    P = pts_world.shape[0]
    nv_pt = expand_noise(tr_pt)
    pre, slots_l, upds_l = [], [], []
    for l, lv in enumerate(levels):
        if lv.tsl.shape[1]:
            raise ValueError("insert_scan_fused requires untracked "
                             "levels (tsl width 0)")
        C = lv.keys.shape[0]
        size = cfg.level_size(l)
        keys = vh.voxel_key(pts_world, size)
        unique_max = min(cfg.unique_max[l], P)
        uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, unique_max)
        occ_before = lv.occ
        tkeys, occ, uslots = vh.insert(lv.keys, lv.occ, uniq, uvalid)
        pslot = jnp.where(inv >= 0, uslots[jnp.maximum(inv, 0)], -1)
        ok = (mask > 0) & (pslot >= 0)
        w = ok.astype(pts_local.dtype)
        center_w = (keys.astype(pts_world.dtype) + 0.5) * size
        q = jnp.einsum("ni,ij->nj", pts_world - center_w, R)  # R^T(pw-c)
        slots_l.append(jnp.clip(pslot, 0, C - 1))
        upds_l.append(mo.pack_updates(q, nv_pt, w))
        newly = uvalid & (uslots >= 0) & ~occ_before[jnp.maximum(uslots, 0)]
        dropped = jnp.sum((uvalid & (uslots < 0)).astype(jnp.int32))
        pre.append((tkeys, occ, uslots, uvalid, newly, dropped))

    accs = mo.accumulate(jnp.stack(slots_l), jnp.stack(upds_l),
                         tuple(lv.keys.shape[0] for lv in levels),
                         interpret=interpret)

    out, touched = [], []
    for l, (lv, acc) in enumerate(zip(levels, accs)):
        C = lv.keys.shape[0]
        size = cfg.level_size(l)
        tkeys, occ, uslots, uvalid, newly, dropped = pre[l]
        n_add = acc[:, 0]
        has = n_add > 0
        delta = acc[:, 1:4] / jnp.maximum(n_add, 1.0)[:, None]
        nv_add = acc[:, 10:15]
        center_slot = (tkeys.astype(acc.dtype) + 0.5) * size
        ref_local = jnp.einsum("ni,ij->nj", center_slot - p[None], R)
        mu_add = jnp.where(has[:, None], ref_local + delta, 0.0)
        S_add = mo.unpack_sym6(acc[:, 4:10]) \
            - n_add[:, None, None] * (delta[:, :, None] * delta[:, None, :])
        S_add = jnp.where(has[:, None, None], S_add, 0.0)
        added = Cluster(n=n_add, mu=mu_add, S=S_add)

        col = lv.win[frame_slot]
        merged = cl.merge(col, added)
        win = jax.tree.map(lambda full, new: full.at[frame_slot].set(new),
                           lv.win, merged)
        win_nv = lv.win_nv.at[frame_slot].add(nv_add)

        # running world-frame total (read by the touched-slot plane
        # refresh): closed-form world version of `added` — the raw
        # voxel-center-relative moments rotate as R q, so
        # delta_w = R delta and S_w = R S R^T exactly
        delta_w = jnp.einsum("ij,cj->ci", R, delta)
        mu_add_w = jnp.where(has[:, None], center_slot + delta_w, 0.0)
        S_add_w = jnp.einsum("ij,cjk,lk->cil", R, S_add, R)
        tot = cl.merge(lv.tot, Cluster(n=n_add, mu=mu_add_w, S=S_add_w))
        tot_nv = lv.tot_nv + jnp.concatenate(
            [jnp.einsum("ij,cj->ci", R, nv_add[:, 0:3]),
             nv_add[:, 3:5]], axis=-1)

        jour_arr = lv.jour.at[jnp.where(newly, uslots, C)].set(
            jnp.float32(jour), mode="drop")
        out.append(dataclasses.replace(
            lv, keys=tkeys, occ=occ, win=win, win_nv=win_nv,
            tot=tot, tot_nv=tot_nv, jour=jour_arr))
        touched.append((uslots, uvalid & (uslots >= 0), dropped))
    return tuple(out), touched


def insert_fixed_level(lv: VoxelLevel, level_size: float, unique_max: int,
                       pts_world: jnp.ndarray, tr_pt: jnp.ndarray,
                       mask: jnp.ndarray, jour):
    """Insert world-frame points directly into the fixed (marginalized)
    statistics — the reference's keyframe-reload `cut_voxel` variant
    (voxel_map.hpp:2108-2152) used by loop_update / keyframe_loading."""
    C = lv.keys.shape[0]
    keys = vh.voxel_key(pts_world, level_size)
    uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, unique_max)
    occ_before = lv.occ
    tkeys, occ, uslots = vh.insert(lv.keys, lv.occ, uniq, uvalid)

    U = uslots.shape[0]
    # per-unique accumulation by the dedup inverse (U-sized), then a
    # row gather/merge/scatter on the claimed fix slots — same sparse
    # pattern as insert_scan_level
    nv_pt = expand_noise(tr_pt)
    ok = (mask > 0) & (inv >= 0)
    # barrier: indices (seg) and update weights (w) share the `ok`
    # producer; fusing it into two operands of one scatter trips an
    # XLA:TPU fusion assertion (scatter_emitter.cc)
    seg, w = jax.lax.optimization_barrier(
        (jnp.where(ok, inv, U), ok.astype(pts_world.dtype)))
    n_add = jnp.zeros((U,)).at[seg].add(w, mode="drop")
    sum_p = jnp.zeros((U, 3)).at[seg].add(pts_world * w[:, None], mode="drop")
    mu_add = sum_p / jnp.maximum(n_add, 1.0)[:, None]
    d = (pts_world - mu_add[jnp.clip(inv, 0, U - 1)]) * w[:, None]
    S_add = jnp.zeros((U, 3, 3)).at[seg].add(
        d[:, :, None] * d[:, None, :], mode="drop")
    nv_add = jnp.zeros((U, NV)).at[seg].add(nv_pt * w[:, None], mode="drop")

    row_ok = uvalid & (uslots >= 0)
    su = jnp.clip(jnp.where(row_ok, uslots, 0), 0, C - 1)
    added_u = Cluster(n=n_add, mu=mu_add, S=S_add)
    f_u = lv.fix[su]
    merged = cl.merge(f_u, added_u)
    nv_new = lv.fix_nv[su] + nv_add
    t_u = cl.merge(lv.tot[su], added_u)       # running world total
    tnv_new = lv.tot_nv[su] + nv_add
    tgt, m_n, m_mu, m_S, nv_new, t_u, tnv_new = \
        jax.lax.optimization_barrier(
            (jnp.where(row_ok, su, C), merged.n, merged.mu, merged.S,
             nv_new, t_u, tnv_new))
    fix = Cluster(
        n=lv.fix.n.at[tgt].set(m_n, mode="drop"),
        mu=lv.fix.mu.at[tgt].set(m_mu, mode="drop"),
        S=lv.fix.S.at[tgt].set(m_S, mode="drop"))
    fix_nv = lv.fix_nv.at[tgt].set(nv_new, mode="drop")
    tot = Cluster(
        n=lv.tot.n.at[tgt].set(t_u.n, mode="drop"),
        mu=lv.tot.mu.at[tgt].set(t_u.mu, mode="drop"),
        S=lv.tot.S.at[tgt].set(t_u.S, mode="drop"))
    tot_nv = lv.tot_nv.at[tgt].set(tnv_new, mode="drop")

    newly = uvalid & (uslots >= 0) & ~occ_before[jnp.maximum(uslots, 0)]
    jour_arr = lv.jour.at[jnp.where(newly, uslots, C)].set(
        jnp.float32(jour), mode="drop")
    lv = dataclasses.replace(lv, keys=tkeys, occ=occ, fix=fix,
                             fix_nv=fix_nv, tot=tot, tot_nv=tot_nv,
                             jour=jour_arr)
    dropped = jnp.sum((uvalid & (uslots < 0)).astype(jnp.int32))
    return lv, uslots, uvalid & (uslots >= 0), dropped


def insert_fixed(levels, cfg: MapConfig, pts_world, tr_pt, mask, jour=0.0):
    levels, _ = insert_fixed_touched(levels, cfg, pts_world, tr_pt, mask,
                                     jour)
    return levels


def insert_fixed_touched(levels, cfg: MapConfig, pts_world, tr_pt, mask,
                         jour=0.0):
    out, touched = [], []
    for l, lv in enumerate(levels):
        lv2, s, sv, dropped = insert_fixed_level(
            lv, cfg.level_size(l), cfg.unique_max[l], pts_world, tr_pt,
            mask, jour)
        out.append(lv2)
        touched.append((s, sv, dropped))
    return tuple(out), touched


# ---------------------------------------------------------------------------
# Plane refresh (reference recut + plane_update, voxel_map.hpp:1344-1456)
# ---------------------------------------------------------------------------

def _phys_poses(Rs, ps, mp, win_count):
    """Window poses + validity reordered to PHYSICAL slot order, so the
    (W, C, ...) window arrays never need permuting (permute the 10 poses,
    not the tables)."""
    W = mp.shape[0]
    # barrier: when mp is itself an iota (init / post-correction), CSE
    # makes the scatter's indices and updates the SAME instruction,
    # tripping the XLA:TPU fusion assertion (scatter_emitter.cc) — keep
    # each scatter operand a distinct barrier output
    idx1, idx2, upd = jax.lax.optimization_barrier(
        (mp, mp, jnp.arange(W, dtype=jnp.int32)))
    inv = jnp.zeros((W,), jnp.int32).at[idx1].set(upd)
    live = (jnp.arange(W) < win_count).astype(Rs.dtype)
    fmask = jnp.zeros((W,), Rs.dtype).at[idx2].set(live)
    return Rs[inv], ps[inv], fmask


def _total_over_frames(win: Cluster, win_nv, fix: Cluster, fix_nv,
                       Rs_p, ps_p, fmask):
    """fix + sum_w transform(win[w], pose_w) as a one-pass anchored
    reduction (exact centered moments, no sequential merge chain).
    win leaves (W, B, ...); fix (B, ...); Rs_p/ps_p/fmask in PHYSICAL
    slot order. The noise records' direction channel rotates with each
    frame (win_nv is local-frame); a/b channels are frame-invariant."""
    n_w = win.n * fmask[:, None]                                  # (W, B)
    mu_w = jnp.einsum("wij,wbj->wbi", Rs_p, win.mu) + ps_p[:, None]
    S_w = jnp.einsum("wij,wbjk,wlk->wbil", Rs_p, win.S, Rs_p)

    n_t = fix.n + jnp.sum(n_w, axis=0)
    inv_n = 1.0 / jnp.maximum(n_t, 1.0)
    mu_t = (fix.n[:, None] * fix.mu
            + jnp.einsum("wb,wbi->bi", n_w, mu_w)) * inv_n[:, None]
    d_w = mu_w - mu_t[None]
    d_f = fix.mu - mu_t
    S_t = (fix.S
           + fix.n[:, None, None] * (d_f[:, :, None] * d_f[:, None, :])
           + jnp.einsum("wbij,w->bij", S_w, fmask)
           + jnp.einsum("wb,wbi,wbj->bij", n_w, d_w, d_w))
    empty = (n_t == 0)[:, None]
    mu_t = jnp.where(empty, 0.0, mu_t)
    S_t = jnp.where(empty[..., None], 0.0, S_t)
    s_w = jnp.einsum("wij,wbj->wbi", Rs_p, win_nv[..., 0:3])
    nv = fix_nv + jnp.concatenate(
        [jnp.einsum("wbi,w->bi", s_w, fmask),
         jnp.einsum("wbk,w->bk", win_nv[..., 3:5], fmask)], axis=-1)
    return Cluster(n=n_t, mu=mu_t, S=S_t), nv


def total_cluster_level(lv: VoxelLevel, Rs: jnp.ndarray, ps: jnp.ndarray,
                        mp: jnp.ndarray, win_count):
    """fix + sum_i transform(win[mp[i]], pose_i) and total noise trace.

    Rs: (W, 3, 3), ps: (W, 3) window poses; mp: (W,) logical->physical
    slot map; frames i >= win_count are ignored.
    """
    Rs_p, ps_p, fmask = _phys_poses(Rs, ps, mp, win_count)
    return _total_over_frames(lv.win, lv.win_nv, lv.fix, lv.fix_nv,
                              Rs_p, ps_p, fmask)


def _plane_fit(total: Cluster, nv_total, occ, layer, cfg: MapConfig,
               min_eig, thr):
    """Plane fit of a batch of total clusters -> (state, slab, lam).

    nv_total: (B, NV) accumulated noise records. The plane-noise
    coefficients use the noise variance along the fitted normal,
    u0^T (sum var_i) u0 = (u0.s)^2 / sum_a + sum_b (see module
    docstring) — anisotropic sensors (beam_err != dept_err) gate
    grazing-incidence planes more loosely along-beam, like the
    reference's full covariance propagation."""
    covm = cl.cov(total)
    lam, V = eigh3(covm)
    n = total.n

    enough = n > cfg.min_point[layer]
    is_plane = (occ & enough
                & (lam[:, 0] < min_eig)
                & (lam[:, 0] < thr * lam[:, 2]))
    can_subdiv = occ & enough & ~is_plane & (layer < cfg.max_layer)
    state = jnp.where(is_plane, STATE_PLANE,
                      jnp.where(can_subdiv, STATE_SUBDIV, STATE_NONE))

    u0 = V[:, :, 0]
    us = jnp.einsum("bi,bi->b", u0, nv_total[:, 0:3])
    asum = nv_total[:, 3]
    # mixed-sign a within a voxel can cancel; fall back to isotropic
    den = jnp.where(jnp.abs(asum) > 1e-12, asum, jnp.inf)
    vsum_n = jnp.maximum(us * us / den + nv_total[:, 4], 1e-12)
    sigma2 = vsum_n / jnp.maximum(n, 1.0)
    # precompute the match-gate plane noise coefficients: the isotropic
    # in-plane form cmean * (I - u0 u0^T) (exact when l1 == l2)
    l0, l1, l2 = lam[:, 0], lam[:, 1], lam[:, 2]
    c_1 = (l0 + l1) / jnp.maximum((l1 - l0) ** 2, 1e-12)
    c_2 = (l0 + l2) / jnp.maximum((l2 - l0) ** 2, 1e-12)
    n_tot = jnp.maximum(n, 1.0)
    cmean = 0.5 * (c_1 + c_2) * sigma2 / n_tot
    cvar = sigma2 / n_tot

    B = state.shape[0]
    slab = jnp.zeros((B, SLAB), covm.dtype)
    slab = slab.at[:, _S_NORMAL].set(V[:, :, 0])
    slab = slab.at[:, _S_CENTER].set(total.mu)
    slab = slab.at[:, _S_RADIUS].set(lam[:, 2])
    slab = slab.at[:, _S_CMEAN].set(cmean)
    slab = slab.at[:, _S_CVAR].set(cvar)
    slab = slab.at[:, _S_STATE].set(state.astype(covm.dtype))
    return state, slab, lam


def refresh_planes_level(lv: VoxelLevel, layer: int, cfg: MapConfig,
                         Rs, ps, mp, win_count,
                         min_eigen_value=None, plane_thr=None,
                         slots=None, svalid=None) -> VoxelLevel:
    """Re-fit planes. With `slots` (U,) given, only those voxels are
    re-evaluated (gather -> fit -> scatter); otherwise the whole table.
    """
    min_eig = cfg.min_eigen_value if min_eigen_value is None else min_eigen_value
    thr = cfg.plane_thr[layer] if plane_thr is None else plane_thr

    if slots is None:
        total, nv_total = total_cluster_level(lv, Rs, ps, mp, win_count)
        state, slab, lam = _plane_fit(total, nv_total, lv.occ, layer, cfg,
                                      min_eig, thr)
        # RESYNC the running world total to the exact value at the
        # current window poses (see VoxelLevel.tot): full refreshes run
        # at init / map rebuild / GBA, exactly where insert-time-pose
        # staleness would otherwise accumulate
        return dataclasses.replace(lv, state=state, slab=slab, lam=lam,
                                   tot=total, tot_nv=nv_total)

    # --- touched-slot refresh: fit straight from the running total —
    # no (W, C) window gathers or per-frame transforms in the hot path
    C = lv.keys.shape[0]
    si = jnp.where(svalid, slots, 0)
    total = lv.tot[si]
    nv = lv.tot_nv[si]

    occ_u = lv.occ[si] & svalid
    state_u, slab_u, lam_u = _plane_fit(total, nv, occ_u, layer, cfg,
                                        min_eig, thr)
    # barrier: see voxel_hash.insert — indices and updates share the
    # (slots, svalid) producers; fusing both into one scatter trips an
    # XLA:TPU fusion assertion
    tgt, state_u, slab_u, lam_u = jax.lax.optimization_barrier(
        (jnp.where(svalid, slots, C), state_u, slab_u, lam_u))
    state = lv.state.at[tgt].set(state_u, mode="drop")
    slab = lv.slab.at[tgt].set(slab_u, mode="drop")
    lam = lv.lam.at[tgt].set(lam_u, mode="drop")
    return dataclasses.replace(lv, state=state, slab=slab, lam=lam)


def refresh_planes(levels, cfg: MapConfig, Rs, ps, mp, win_count,
                   min_eigen_value=None, plane_thr=None, touched=None):
    """touched: optional per-level (slots, valid[, dropped]) from
    insert_*_touched; when given, only those voxels are re-fit
    (incremental refresh)."""
    out = []
    for l, lv in enumerate(levels):
        s, sv = (None, None) if touched is None else touched[l][:2]
        out.append(refresh_planes_level(lv, l, cfg, Rs, ps, mp, win_count,
                                        min_eigen_value, plane_thr, s, sv))
    return tuple(out)


# ---------------------------------------------------------------------------
# Point-to-plane matching (reference OctoTree::match, voxel_map.hpp:1649-1721)
# ---------------------------------------------------------------------------

def match_locate(levels, cfg: MapConfig, pts_world: jnp.ndarray,
                 mask: jnp.ndarray):
    """Resolve each world point to its plane record (octree descent).

    Probes all levels, gathers each level's slab once, and applies the
    descent cascade (plane -> use, subdiv -> next level). Returns the
    (N, SLAB) selected records + (N,) found flag. The records are
    position-independent plane parameters, so the iEKF can re-evaluate
    the gates at updated poses without re-probing (the reference caches
    the matched octree node per point the same way, voxelslam.cpp:
    988-1010 `inside()` short-circuit).
    """
    N = pts_world.shape[0]
    rec = jnp.zeros((N, SLAB), pts_world.dtype)
    found = jnp.zeros((N,), jnp.bool_)
    # per-level descend-gated probes: measured FASTER than fusing all
    # levels into one shared probe loop — the descend mask empties
    # quickly at deeper levels, so the per-level loops exit after fewer
    # rounds than a fused loop paying max-rounds across levels
    # (38.9 vs 40.4 ms/scan fused, full scan step on TPU).
    descend = jnp.ones((N,), jnp.bool_)
    for l, lv in enumerate(levels):
        keys = vh.voxel_key(pts_world, cfg.level_size(l))
        s = vh.lookup(lv.keys, lv.occ, keys, (mask > 0) & descend)
        r = lv.slab[jnp.maximum(s, 0)]
        st = jnp.where(s >= 0, r[:, _S_STATE], 0.0)
        use_l = descend & (st == STATE_PLANE)
        descend = descend & (st == STATE_SUBDIV)
        rec = jnp.where(use_l[:, None], r, rec)
        found = found | use_l
    return rec, found


def match_eval(rec: jnp.ndarray, found: jnp.ndarray,
               pts_world: jnp.ndarray, var_world: jnp.ndarray,
               mask: jnp.ndarray):
    """Evaluate the match gates for located records at (possibly updated)
    world points. Gate = reference's: in-plane radius <= 9 * radius and
    |d| < 3 sqrt(sigma), sigma = d^T cov_n d + cvar + n^T var_w n."""
    normal = rec[:, _S_NORMAL]
    center = rec[:, _S_CENTER]
    radius = rec[:, _S_RADIUS]
    cmean = rec[:, _S_CMEAN]
    cvar = rec[:, _S_CVAR]

    dvec = pts_world - center
    dist = jnp.einsum("ni,ni->n", normal, dvec)
    dd = jnp.einsum("ni,ni->n", dvec, dvec)
    range_dis = dd - dist * dist
    in_radius = range_dis <= 9.0 * radius

    # d^T [cmean (I - n n^T)] d = cmean * (|d|^2 - (n.d)^2)
    sigma = (cmean * range_dis
             + cvar
             + jnp.einsum("ni,nij,nj->n", normal, var_world, normal))
    in_gate = jnp.abs(dist) < 3.0 * jnp.sqrt(jnp.maximum(sigma, 1e-12))
    valid = found & in_radius & in_gate & (mask > 0)
    return dict(valid=valid, normal=normal, center=center, sigma=sigma,
                dist=dist)


def match_points(levels, cfg: MapConfig, pts_world: jnp.ndarray,
                 var_world: jnp.ndarray, mask: jnp.ndarray):
    """Associate world points with map planes (locate + eval in one)."""
    rec, found = match_locate(levels, cfg, pts_world, mask)
    return match_eval(rec, found, pts_world, var_world, mask)


# ---------------------------------------------------------------------------
# Marginalization (reference OctoTree::margi, voxel_map.hpp:1465-1598)
# ---------------------------------------------------------------------------

def marginalize_level(lv: VoxelLevel, cfg: MapConfig, Rs, ps, mp,
                      win_count, mgsize: int) -> VoxelLevel:
    """Fold the oldest `mgsize` window frames into the fixed statistics
    (until the max_points cap), then clear those window slots.

    With touched-slot tracking on (tsl width > 0) the fold is SPARSE:
    each marginalized frame's window column is nonzero only at the <= T
    slots its one scan touched (see the tsl invariant on VoxelLevel),
    so the transform/merge/cap runs on a (T,) gather instead of three
    full-(C,) passes. The column clear stays a full zero write — pure
    store, and it keeps the invariant self-healing."""
    C = lv.keys.shape[0]
    W = lv.win.n.shape[0]
    T = lv.tsl.shape[1]

    if T == 0:
        # untracked level (GBA window maps): original full-table fold
        moved = Cluster.empty((C,))
        nv_m = jnp.zeros_like(lv.fix_nv)
        for i in range(mgsize):
            c_w = cl.transform(lv.win[mp[i]], Rs[i], ps[i])
            moved = cl.merge(moved, c_w)
            nv_i = lv.win_nv[mp[i]]
            nv_m = nv_m + jnp.concatenate(
                [jnp.einsum("ij,bj->bi", Rs[i], nv_i[:, 0:3]),
                 nv_i[:, 3:5]], axis=-1)
        take = lv.fix.n < cfg.max_points
        folded = cl.merge(lv.fix, moved)
        fix = Cluster(
            n=jnp.where(take, folded.n, lv.fix.n),
            mu=jnp.where(take[:, None], folded.mu, lv.fix.mu),
            S=jnp.where(take[:, None, None], folded.S, lv.fix.S),
        )
        fix_nv = jnp.where(take[:, None], lv.fix_nv + nv_m, lv.fix_nv)
    else:
        fix, fix_nv = lv.fix, lv.fix_nv
        # the max_points cap is checked ONCE against the PRE-fold counts
        # (reference margi checks before folding, voxel_map.hpp:1543):
        # with mgsize > 1 a slot pushed past the cap by frame 0 must
        # still absorb frame 1's points, like the T==0 path below
        pre_n = lv.fix.n
        win_flat = jax.tree.map(
            lambda a: a.reshape((W * C,) + a.shape[2:]), lv.win)
        nvw_flat = lv.win_nv.reshape((W * C, NV))
        for i in range(mgsize):
            row = lv.tsl[mp[i]]                      # (T,) slot ids
            sv = row < C
            si = jnp.where(sv, row, 0)
            svf = sv.astype(fix.mu.dtype)
            flat = mp[i] * C + si
            c_l = jax.tree.map(lambda a: a[flat], win_flat)
            c_l = Cluster(n=c_l.n * svf, mu=c_l.mu * svf[:, None],
                          S=c_l.S * svf[:, None, None])
            c_w = cl.transform(c_l, Rs[i], ps[i])
            nv_i = nvw_flat[flat] * svf[:, None]
            nv_w = jnp.concatenate(
                [jnp.einsum("ij,bj->bi", Rs[i], nv_i[:, 0:3]),
                 nv_i[:, 3:5]], axis=-1)
            f_u = fix[si]
            fnv_u = fix_nv[si]
            take = pre_n[si] < cfg.max_points
            folded = cl.merge(f_u, c_w)
            new_n = jnp.where(take, folded.n, f_u.n)
            new_mu = jnp.where(take[:, None], folded.mu, f_u.mu)
            new_S = jnp.where(take[:, None, None], folded.S, f_u.S)
            new_nv = jnp.where(take[:, None], fnv_u + nv_w, fnv_u)
            # barrier: see voxel_hash.insert (scatter fusion assertion)
            tgt, new_n, new_mu, new_S, new_nv = jax.lax.optimization_barrier(
                (jnp.where(sv, si, C), new_n, new_mu, new_S, new_nv))
            fix = Cluster(
                n=fix.n.at[tgt].set(new_n, mode="drop"),
                mu=fix.mu.at[tgt].set(new_mu, mode="drop"),
                S=fix.S.at[tgt].set(new_S, mode="drop"))
            fix_nv = fix_nv.at[tgt].set(new_nv, mode="drop")

    win, win_nv, tsl = lv.win, lv.win_nv, lv.tsl
    for i in range(mgsize):
        win = jax.tree.map(
            lambda full: full.at[mp[i]].set(jnp.zeros_like(full[mp[i]])),
            win)
        win_nv = win_nv.at[mp[i]].set(0.0)
        if T:
            tsl = tsl.at[mp[i]].set(C)

    return dataclasses.replace(lv, fix=fix, fix_nv=fix_nv, win=win,
                               win_nv=win_nv, tsl=tsl)


def marginalize(levels, cfg: MapConfig, Rs, ps, mp, win_count, mgsize: int):
    return tuple(marginalize_level(lv, cfg, Rs, ps, mp, win_count, mgsize)
                 for lv in levels)


# ---------------------------------------------------------------------------
# Distance-based eviction (reference idle-time reclamation: drop octrees
# whose jour stamp is > 700 m behind the current travel distance,
# voxelslam.cpp:1786-1833)
# ---------------------------------------------------------------------------

def evict_level(lv: VoxelLevel, jour_now, max_dist: float):
    """Rebuild the level keeping only voxels created within `max_dist`
    of the current journey distance. Rehashes survivors into a fresh
    table (open addressing cannot delete in place without breaking probe
    chains) and permutes every per-slot array. Run occasionally from the
    host when load factor grows — not in the per-scan step.

    Returns (level, dropped): survivors whose rehash exhausted PROBES
    vanish from the map, so the count is surfaced to the caller."""
    C = lv.keys.shape[0]
    keep = lv.occ & (jour_now - lv.jour <= max_dist)
    nkeys, nocc = vh.empty_table(C)
    nkeys, nocc, slots = vh.insert(nkeys, nocc, lv.keys, keep)
    dropped = jnp.sum((keep & (slots < 0)).astype(jnp.int32))
    # barrier: see voxel_hash.insert (scatter fusion assertion)
    tgt, keep = jax.lax.optimization_barrier(
        (jnp.where(keep & (slots >= 0), slots, C), keep))

    def perm(src):
        return jnp.zeros_like(src).at[tgt].set(
            jnp.where(keep.reshape((-1,) + (1,) * (src.ndim - 1)),
                      src, jnp.zeros_like(src)), mode="drop")

    def perm_w(src):   # (W, C, ...) arrays: permute axis 1
        z = jnp.zeros_like(src)
        kk = keep.reshape((1, -1) + (1,) * (src.ndim - 2))
        return z.at[:, tgt].set(jnp.where(kk, src, 0.0), mode="drop")

    # touched-slot lists hold OLD slot ids: remap through the rehash
    # (dropped/evicted voxels -> sentinel C)
    remap = jnp.concatenate(
        [jnp.where(keep & (slots >= 0), slots, C),
         jnp.full((1,), C, jnp.int32)])
    tsl_new = remap[jnp.clip(lv.tsl, 0, C)] if lv.tsl.shape[1] else lv.tsl

    return VoxelLevel(
        keys=nkeys, occ=nocc,
        win=jax.tree.map(perm_w, lv.win),
        win_nv=perm_w(lv.win_nv),
        fix=jax.tree.map(perm, lv.fix),
        fix_nv=perm(lv.fix_nv),
        tot=jax.tree.map(perm, lv.tot),
        tot_nv=perm(lv.tot_nv),
        state=perm(lv.state),
        slab=perm(lv.slab),
        lam=perm(lv.lam),
        jour=perm(lv.jour),
        tsl=tsl_new,
    ), dropped


def evict(levels, jour_now, max_dist: float = 700.0):
    """Returns (levels, dropped_per_level) — see evict_level."""
    outs = [evict_level(lv, jour_now, max_dist) for lv in levels]
    return tuple(o[0] for o in outs), jnp.stack([o[1] for o in outs])


def map_stats(levels):
    """Occupancy / plane counts for observability."""
    out = {}
    for l, lv in enumerate(levels):
        out[f"occ_{l}"] = jnp.sum(lv.occ)
        out[f"planes_{l}"] = jnp.sum(lv.state == STATE_PLANE)
    return out


# ---------------------------------------------------------------------------
# Factor harvest (reference OctoTree::tras_opt, voxel_map.hpp:1605-1638)
# ---------------------------------------------------------------------------

def compact_indices(flags: jnp.ndarray, size: int, fill: int) -> jnp.ndarray:
    """First `size` indices where flags is True, in ascending order,
    padded with `fill` — jnp.nonzero(flags, size, fill)[0] semantics via
    cumsum + binary search: XLA lowers nonzero-with-size to a scatter
    that runs ~3 ms at C=64k on TPU; searchsorted over the running count
    is ~1 ms (measured r04)."""
    C = flags.shape[0]
    cs = jnp.cumsum(flags.astype(jnp.int32))
    idx = jnp.searchsorted(cs, jnp.arange(1, size + 1, dtype=jnp.int32),
                           side="left")
    return jnp.where(idx < C, idx, fill).astype(jnp.int32)

def harvest_level(lv: VoxelLevel, cfg: MapConfig, mp: jnp.ndarray,
                  factor_max: int, eig_ratio: float):
    """Gather eligible plane voxels of one level into dense factor arrays.

    Eligibility mirrors tras_opt: plane leaf, lam0/lam1 <= eig_ratio, and
    live window points present. Returns (win (F, W) Cluster in logical
    frame order, fix (F,) Cluster, valid (F,)).
    """
    C = lv.keys.shape[0]
    W = mp.shape[0]
    n_win = jnp.sum(lv.win.n, axis=0)
    eligible = ((lv.state == STATE_PLANE)
                & (lv.lam[:, 0] <= eig_ratio * jnp.maximum(lv.lam[:, 1], 1e-12))
                & (n_win > 0))
    idx = compact_indices(eligible, factor_max, C)
    valid = idx < C
    safe = jnp.minimum(idx, C - 1)

    # (F, W) window clusters in logical frame order: take slots in mp
    # order (W-major layout), gather factor rows, then move W inside
    win = jax.tree.map(
        lambda a: jnp.moveaxis(a[mp][:, safe], 0, 1), lv.win)
    win = jax.tree.map(
        lambda a: jnp.where(
            valid.reshape((-1,) + (1,) * (a.ndim - 1)), a, jnp.zeros_like(a)),
        win)
    fix = lv.fix[safe]
    fix = jax.tree.map(
        lambda a: jnp.where(
            valid.reshape((-1,) + (1,) * (a.ndim - 1)), a, jnp.zeros_like(a)),
        fix)
    return win, fix, valid


def harvest(levels, cfg: MapConfig, mp: jnp.ndarray, factor_max: int):
    """Concatenate factor batches across levels into one FactorBatch."""
    from ..ba.lidar_factor import FactorBatch

    wins, fixes, valids = [], [], []
    for lv in levels:
        w, f, v = harvest_level(lv, cfg, mp, factor_max, cfg.eig_ratio_ba)
        wins.append(w)
        fixes.append(f)
        valids.append(v)
    win = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *wins)
    fix = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *fixes)
    valid = jnp.concatenate(valids, axis=0)
    return FactorBatch(win=win, fix=fix, coeff=valid.astype(jnp.float32),
                       valid=valid)


def harvest_level_t(lv: VoxelLevel, cfg: MapConfig, mp: jnp.ndarray,
                    factor_max: int, eig_ratio: float):
    """`harvest_level` emitting factor-MINOR arrays (factor axis last =
    TPU lanes), the layout the Newton kernels consume
    (ba.lidar_factor.hess_grad_ct_t) — the gathers write lane-dense
    rows directly instead of round-tripping through (F, W, 3, 3)."""
    C = lv.keys.shape[0]
    W = mp.shape[0]
    n_win = jnp.sum(lv.win.n, axis=0)
    eligible = ((lv.state == STATE_PLANE)
                & (lv.lam[:, 0] <= eig_ratio * jnp.maximum(lv.lam[:, 1], 1e-12))
                & (n_win > 0))
    idx = compact_indices(eligible, factor_max, C)
    valid = idx < C
    safe = jnp.minimum(idx, C - 1)
    vf = valid.astype(lv.win.mu.dtype)

    n_l = lv.win.n[mp][:, safe] * vf[None]                       # (W, F)
    mu_l = jnp.transpose(lv.win.mu[mp][:, safe], (0, 2, 1)) * vf[None, None]
    S_l = (jnp.transpose(lv.win.S[mp][:, safe], (0, 2, 3, 1))
           * vf[None, None, None])                               # (W,3,3,F)
    fix_n = lv.fix.n[safe] * vf
    fix_mu = lv.fix.mu[safe].T * vf[None]
    fix_S = jnp.transpose(lv.fix.S[safe], (1, 2, 0)) * vf[None, None]
    return n_l, mu_l, S_l, fix_n, fix_mu, fix_S, vf


def harvest_t(levels, cfg: MapConfig, mp: jnp.ndarray, factor_max: int):
    """Factor-minor harvest across levels: returns the transposed
    factor tuple (see ba.lidar_factor.transpose_factors) ready for
    lm_li / lm_lidar — no (F, W, ...) intermediate ever exists."""
    parts = [harvest_level_t(lv, cfg, mp, factor_max, cfg.eig_ratio_ba)
             for lv in levels]
    return tuple(jnp.concatenate([p[i] for p in parts], axis=-1)
                 for i in range(7))
