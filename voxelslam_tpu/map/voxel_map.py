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
(slot, window-slot) — the SlideWindow equivalent (voxel_map.hpp:1009) —
so BA can re-transform them under pose updates in closed form.

Plane parameter covariance: the reference propagates full per-point
covariances through the eigenvector perturbation (Bf_var/plane_update,
voxel_map.hpp:106-121,1344-1388). We accumulate the per-point noise
level sigma^2 = trace(cov)/3 instead and use the closed-form isotropic
plane uncertainty

    cov(normal) = sigma^2/N * sum_{k!=0} (l0+lk)/(l0-lk)^2 u_k u_k^T
    cov(center) = sigma^2/N * I

which keeps the same 3-sigma match gate semantics (voxel_map.hpp:
1649-1721) with O(1) state per voxel instead of a 9x9 accumulator.
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


@partial(jax.tree_util.register_dataclass,
         data_fields=["keys", "occ", "win", "win_tr", "fix", "fix_tr",
                      "state", "normal", "center", "radius", "lam",
                      "sigma2", "jour"],
         meta_fields=[])
@dataclasses.dataclass
class VoxelLevel:
    keys: jnp.ndarray      # (C, 3) int32
    occ: jnp.ndarray       # (C,) bool
    win: Cluster           # leaves (C, W, ...): local-frame per window slot
    win_tr: jnp.ndarray    # (C, W) sum of per-point trace(cov)/3
    fix: Cluster           # (C, ...): world-frame marginalized points
    fix_tr: jnp.ndarray    # (C,)
    state: jnp.ndarray     # (C,) int32
    normal: jnp.ndarray    # (C, 3) plane normal (world)
    center: jnp.ndarray    # (C, 3)
    radius: jnp.ndarray    # (C,) = lambda_2 of normalized cov
    lam: jnp.ndarray       # (C, 3) eigenvalues of normalized cov
    sigma2: jnp.ndarray    # (C,) mean per-point noise variance
    jour: jnp.ndarray      # (C,) travel-distance stamp at creation


def empty_level(capacity: int, win_size: int) -> VoxelLevel:
    keys, occ = vh.empty_table(capacity)
    C = capacity
    return VoxelLevel(
        keys=keys, occ=occ,
        win=Cluster.empty((C, win_size)),
        win_tr=jnp.zeros((C, win_size)),
        fix=Cluster.empty((C,)),
        fix_tr=jnp.zeros((C,)),
        state=jnp.zeros((C,), jnp.int32),
        normal=jnp.zeros((C, 3)),
        center=jnp.zeros((C, 3)),
        radius=jnp.zeros((C,)),
        lam=jnp.zeros((C, 3)),
        sigma2=jnp.zeros((C,)),
        jour=jnp.zeros((C,)),
    )


def empty_map(cfg: MapConfig):
    return tuple(empty_level(c, cfg.win_size) for c in cfg.capacities)


# ---------------------------------------------------------------------------
# Insertion (reference cut_voxel / cut_voxel_multi, voxel_map.hpp:1896-2096)
# ---------------------------------------------------------------------------

def insert_scan_level(lv: VoxelLevel, level_size: float, unique_max: int,
                      pts_world: jnp.ndarray, pts_local: jnp.ndarray,
                      tr_pt: jnp.ndarray, mask: jnp.ndarray,
                      frame_slot, jour) -> VoxelLevel:
    """Insert one scan's points into a level at window slot `frame_slot`."""
    C = lv.keys.shape[0]
    keys = vh.voxel_key(pts_world, level_size)
    uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, unique_max)

    occ_before = lv.occ
    tkeys, occ, uslots = vh.insert(lv.keys, lv.occ, uniq, uvalid)

    pslot = jnp.where(inv >= 0, uslots[jnp.maximum(inv, 0)], -1)
    ok = (mask > 0) & (pslot >= 0)
    seg = jnp.where(ok, pslot, C)
    w = ok.astype(pts_local.dtype)

    n_add = jnp.zeros((C,)).at[seg].add(w, mode="drop")
    sum_p = jnp.zeros((C, 3)).at[seg].add(pts_local * w[:, None], mode="drop")
    mu_add = sum_p / jnp.maximum(n_add, 1.0)[:, None]
    d = (pts_local - mu_add[jnp.maximum(pslot, 0)]) * w[:, None]
    S_add = jnp.zeros((C, 3, 3)).at[seg].add(
        d[:, :, None] * d[:, None, :], mode="drop")
    tr_add = jnp.zeros((C,)).at[seg].add(tr_pt * w, mode="drop")

    added = Cluster(n=n_add, mu=mu_add, S=S_add)
    col = lv.win[:, frame_slot]
    merged = cl.merge(col, added)
    win = jax.tree.map(lambda full, new: full.at[:, frame_slot].set(new),
                       lv.win, merged)
    win_tr = lv.win_tr.at[:, frame_slot].add(tr_add)

    # stamp journey distance on newly created voxels
    newly = uvalid & (uslots >= 0) & ~occ_before[jnp.maximum(uslots, 0)]
    jour_arr = lv.jour.at[jnp.where(newly, uslots, C)].set(
        jnp.float32(jour), mode="drop")

    return dataclasses.replace(lv, keys=tkeys, occ=occ, win=win,
                               win_tr=win_tr, jour=jour_arr)


def insert_scan(levels, cfg: MapConfig, pts_world, pts_local, tr_pt, mask,
                frame_slot, jour=0.0):
    return tuple(
        insert_scan_level(lv, cfg.level_size(l), cfg.unique_max[l],
                          pts_world, pts_local, tr_pt, mask, frame_slot, jour)
        for l, lv in enumerate(levels)
    )


def insert_fixed_level(lv: VoxelLevel, level_size: float, unique_max: int,
                       pts_world: jnp.ndarray, tr_pt: jnp.ndarray,
                       mask: jnp.ndarray, jour) -> VoxelLevel:
    """Insert world-frame points directly into the fixed (marginalized)
    statistics — the reference's keyframe-reload `cut_voxel` variant
    (voxel_map.hpp:2108-2152) used by loop_update / keyframe_loading."""
    C = lv.keys.shape[0]
    keys = vh.voxel_key(pts_world, level_size)
    uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, unique_max)
    occ_before = lv.occ
    tkeys, occ, uslots = vh.insert(lv.keys, lv.occ, uniq, uvalid)

    pslot = jnp.where(inv >= 0, uslots[jnp.maximum(inv, 0)], -1)
    ok = (mask > 0) & (pslot >= 0)
    seg = jnp.where(ok, pslot, C)
    w = ok.astype(pts_world.dtype)

    n_add = jnp.zeros((C,)).at[seg].add(w, mode="drop")
    sum_p = jnp.zeros((C, 3)).at[seg].add(pts_world * w[:, None], mode="drop")
    mu_add = sum_p / jnp.maximum(n_add, 1.0)[:, None]
    d = (pts_world - mu_add[jnp.maximum(pslot, 0)]) * w[:, None]
    S_add = jnp.zeros((C, 3, 3)).at[seg].add(
        d[:, :, None] * d[:, None, :], mode="drop")
    tr_add = jnp.zeros((C,)).at[seg].add(tr_pt * w, mode="drop")

    fix = cl.merge(lv.fix, Cluster(n=n_add, mu=mu_add, S=S_add))
    fix_tr = lv.fix_tr + tr_add

    newly = uvalid & (uslots >= 0) & ~occ_before[jnp.maximum(uslots, 0)]
    jour_arr = lv.jour.at[jnp.where(newly, uslots, C)].set(
        jnp.float32(jour), mode="drop")
    return dataclasses.replace(lv, keys=tkeys, occ=occ, fix=fix,
                               fix_tr=fix_tr, jour=jour_arr)


def insert_fixed(levels, cfg: MapConfig, pts_world, tr_pt, mask, jour=0.0):
    return tuple(
        insert_fixed_level(lv, cfg.level_size(l), cfg.unique_max[l],
                           pts_world, tr_pt, mask, jour)
        for l, lv in enumerate(levels)
    )


# ---------------------------------------------------------------------------
# Plane refresh (reference recut + plane_update, voxel_map.hpp:1344-1456)
# ---------------------------------------------------------------------------

def total_cluster_level(lv: VoxelLevel, Rs: jnp.ndarray, ps: jnp.ndarray,
                        mp: jnp.ndarray, win_count):
    """fix + sum_i transform(win[:, mp[i]], pose_i) and total noise trace.

    Rs: (W, 3, 3), ps: (W, 3) window poses; mp: (W,) logical->physical
    slot map; frames i >= win_count are ignored.
    """
    W = mp.shape[0]
    total = lv.fix
    tr = lv.fix_tr
    for i in range(W):
        valid = jnp.asarray(i < win_count)
        c_i = lv.win[:, mp[i]]
        c_w = cl.transform(c_i, Rs[i], ps[i])
        c_w = Cluster(n=jnp.where(valid, c_w.n, 0.0),
                      mu=jnp.where(valid, c_w.mu, 0.0),
                      S=jnp.where(valid, c_w.S, 0.0))
        total = cl.merge(total, c_w)
        tr = tr + jnp.where(valid, lv.win_tr[:, mp[i]], 0.0)
    return total, tr


def refresh_planes_level(lv: VoxelLevel, layer: int, cfg: MapConfig,
                         Rs, ps, mp, win_count,
                         min_eigen_value=None, plane_thr=None) -> VoxelLevel:
    min_eig = cfg.min_eigen_value if min_eigen_value is None else min_eigen_value
    thr = cfg.plane_thr[layer] if plane_thr is None else plane_thr

    total, tr_total = total_cluster_level(lv, Rs, ps, mp, win_count)
    cov = cl.cov(total)
    lam, V = eigh3(cov)
    n = total.n

    enough = n > cfg.min_point[layer]
    is_plane = (lv.occ & enough
                & (lam[:, 0] < min_eig)
                & (lam[:, 0] < thr * lam[:, 2]))
    can_subdiv = lv.occ & enough & ~is_plane & (layer < cfg.max_layer)
    state = jnp.where(is_plane, STATE_PLANE,
                      jnp.where(can_subdiv, STATE_SUBDIV, STATE_NONE))

    sigma2 = tr_total / jnp.maximum(n, 1.0)
    return dataclasses.replace(
        lv,
        state=state,
        normal=V[:, :, 0],
        center=total.mu,
        radius=lam[:, 2],
        lam=lam,
        sigma2=sigma2,
    )


def refresh_planes(levels, cfg: MapConfig, Rs, ps, mp, win_count,
                   min_eigen_value=None, plane_thr=None):
    return tuple(
        refresh_planes_level(lv, l, cfg, Rs, ps, mp, win_count,
                             min_eigen_value, plane_thr)
        for l, lv in enumerate(levels)
    )


# ---------------------------------------------------------------------------
# Point-to-plane matching (reference OctoTree::match, voxel_map.hpp:1649-1721)
# ---------------------------------------------------------------------------

def match_points(levels, cfg: MapConfig, pts_world: jnp.ndarray,
                 var_world: jnp.ndarray, mask: jnp.ndarray):
    """Associate world points with map planes, descending levels.

    Returns dict(valid, normal, center, sigma) each (N, ...). The gate is
    the reference's: in-plane radius <= 9 * radius and |d| < 3 sqrt(sigma)
    with sigma = (w-c)^T cov_n (w-c) + n^T cov_c n + n^T var_world n.
    """
    N = pts_world.shape[0]
    # per level: slot + state
    slots, states = [], []
    for l, lv in enumerate(levels):
        keys = vh.voxel_key(pts_world, cfg.level_size(l))
        s = vh.lookup(lv.keys, lv.occ, keys, mask > 0)
        slots.append(s)
        states.append(jnp.where(s >= 0, lv.state[jnp.maximum(s, 0)], STATE_NONE))

    # octree descent as a cascade of wheres
    use = []
    descend = jnp.ones((N,), jnp.bool_)
    for l in range(cfg.levels):
        use_l = descend & (states[l] == STATE_PLANE)
        descend = descend & (states[l] == STATE_SUBDIV)
        use.append(use_l)

    sel_level = jnp.full((N,), -1, jnp.int32)
    for l in range(cfg.levels):
        sel_level = jnp.where(use[l], l, sel_level)
    valid = sel_level >= 0

    normal = jnp.zeros((N, 3))
    center = jnp.zeros((N, 3))
    radius = jnp.zeros((N,))
    nvar = jnp.zeros((N, 3, 3))
    cvar = jnp.zeros((N,))
    for l, lv in enumerate(levels):
        si = jnp.maximum(slots[l], 0)
        pick = use[l]
        normal = jnp.where(pick[:, None], lv.normal[si], normal)
        center = jnp.where(pick[:, None], lv.center[si], center)
        radius = jnp.where(pick, lv.radius[si], radius)
        # closed-form isotropic plane-normal covariance from stored lam:
        # cov_n = s2/N * sum_{k!=0} (l0+lk)/(l0-lk)^2 u_k u_k^T. We take the
        # in-plane-isotropic form cmean * (I - u0 u0^T) (exact when l1==l2),
        # which only needs the stored normal + eigenvalues.
        lam = lv.lam[si]
        n_tot = jnp.maximum(lv.fix.n[si] + jnp.sum(lv.win.n[si], axis=-1), 1.0)
        s2 = lv.sigma2[si]
        l0, l1, l2 = lam[:, 0], lam[:, 1], lam[:, 2]
        c_1 = (l0 + l1) / jnp.maximum((l1 - l0) ** 2, 1e-12)
        c_2 = (l0 + l2) / jnp.maximum((l2 - l0) ** 2, 1e-12)
        cmean = 0.5 * (c_1 + c_2) * s2 / n_tot
        u0 = lv.normal[si]
        P = jnp.eye(3)[None] - u0[:, :, None] * u0[:, None, :]
        nvar = jnp.where(pick[:, None, None], cmean[:, None, None] * P, nvar)
        cvar = jnp.where(pick, s2 / n_tot, cvar)

    # gates
    dvec = pts_world - center
    dist = jnp.einsum("ni,ni->n", normal, dvec)
    range_dis = jnp.einsum("ni,ni->n", dvec, dvec) - dist * dist
    in_radius = range_dis <= 9.0 * radius

    sigma = (jnp.einsum("ni,nij,nj->n", dvec, nvar, dvec)
             + cvar
             + jnp.einsum("ni,nij,nj->n", normal, var_world, normal))
    in_gate = jnp.abs(dist) < 3.0 * jnp.sqrt(jnp.maximum(sigma, 1e-12))
    valid = valid & in_radius & in_gate & (mask > 0)

    return dict(valid=valid, normal=normal, center=center, sigma=sigma,
                dist=dist)


# ---------------------------------------------------------------------------
# Marginalization (reference OctoTree::margi, voxel_map.hpp:1465-1598)
# ---------------------------------------------------------------------------

def marginalize_level(lv: VoxelLevel, cfg: MapConfig, Rs, ps, mp,
                      win_count, mgsize: int) -> VoxelLevel:
    """Fold the oldest `mgsize` window frames into the fixed statistics
    (until the max_points cap), then clear those window slots."""
    moved = Cluster.empty((lv.keys.shape[0],))
    tr_m = jnp.zeros_like(lv.fix_tr)
    for i in range(mgsize):
        c_w = cl.transform(lv.win[:, mp[i]], Rs[i], ps[i])
        moved = cl.merge(moved, c_w)
        tr_m = tr_m + lv.win_tr[:, mp[i]]

    take = lv.fix.n < cfg.max_points
    folded = cl.merge(lv.fix, moved)
    fix = Cluster(
        n=jnp.where(take, folded.n, lv.fix.n),
        mu=jnp.where(take[:, None], folded.mu, lv.fix.mu),
        S=jnp.where(take[:, None, None], folded.S, lv.fix.S),
    )
    fix_tr = jnp.where(take, lv.fix_tr + tr_m, lv.fix_tr)

    win, win_tr = lv.win, lv.win_tr
    for i in range(mgsize):
        win = jax.tree.map(
            lambda full, z=None: full.at[:, mp[i]].set(jnp.zeros_like(full[:, mp[i]])),
            win)
        win_tr = win_tr.at[:, mp[i]].set(0.0)

    return dataclasses.replace(lv, fix=fix, fix_tr=fix_tr, win=win,
                               win_tr=win_tr)


def marginalize(levels, cfg: MapConfig, Rs, ps, mp, win_count, mgsize: int):
    return tuple(marginalize_level(lv, cfg, Rs, ps, mp, win_count, mgsize)
                 for lv in levels)


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

def harvest_level(lv: VoxelLevel, cfg: MapConfig, mp: jnp.ndarray,
                  factor_max: int, eig_ratio: float):
    """Gather eligible plane voxels of one level into dense factor arrays.

    Eligibility mirrors tras_opt: plane leaf, lam0/lam1 <= eig_ratio, and
    live window points present. Returns (win (F, W) Cluster in logical
    frame order, fix (F,) Cluster, valid (F,)).
    """
    C = lv.keys.shape[0]
    W = mp.shape[0]
    n_win = jnp.sum(lv.win.n, axis=-1)
    eligible = ((lv.state == STATE_PLANE)
                & (lv.lam[:, 0] <= eig_ratio * jnp.maximum(lv.lam[:, 1], 1e-12))
                & (n_win > 0))
    idx = jnp.nonzero(eligible, size=factor_max, fill_value=C)[0]
    valid = idx < C
    safe = jnp.minimum(idx, C - 1)

    # (F, W) window clusters in logical frame order
    win = jax.tree.map(lambda a: a[safe][:, mp], lv.win)
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
