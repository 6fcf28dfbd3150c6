"""Hierarchical global bundle adjustment (HBA).

Capability parity with the reference's global-mapping thread + finish
path (`thd_globalmapping` voxelslam.cpp:3018-3141, `HBA_add_edge`
:2822-3015, `topDownProcess` :2717-2812 in the reference tree):

  * bottom-up: keyframes consumed in windows of `win` (stride `stride`);
    per window a LiDAR-only BA over the keyframe poses with a
    coarse-to-fine voxel schedule (coarse GBA params until first
    convergence, then the odometry map params, :2871-2917), then
    all-pairs relative-pose edges whose variances come from the BA
    Hessian off-diagonals (1/|H_ij|, skip when < 1e-6, :2926-2951), and
    a condensed submap cloud (merge into first-frame coords, downsample
    at voxel_size/8, :2954-2985)
  * total BA: the same window BA over ALL submaps (gba_edges2, :3116)
  * top-down: all bottom-up + total edges join the multi-session scan
    pose graph and one batch solve writes every session back
    (:2734-2803) — our GN pose-graph solver replaces ISAM2.

TPU structure: one window BA is one jitted step over fixed shapes
(win x kf_point_max clouds -> tensorized voxel map -> harvested factor
batch -> convergence-driven coarse->fine LM). Windows are independent;
construct `HbaRunner(cfg, mesh=...)` and the SAME window step runs
vmapped + sharded over the mesh's "win" axis
(`parallel.dist_gba.make_window_fleet`) — the multi-chip production
path used by `SlamSystem` whenever >1 device is visible.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig, MapConfig
from ..map import voxel_map as vm
from ..ba import optimizers as opt
from ..pipeline.loop import Keyframe, LoopEdge


class HbaRunner:
    def __init__(self, cfg: SlamConfig, kf_point_max: int = 8192,
                 capacity: int = 1 << 13, unique_max: int = 4096,
                 mesh=None, fleet_batch: int | None = None):
        """mesh: optional jax.sharding.Mesh with axis "win" — bottom-up
        windows are then batched and sharded across it
        (parallel.dist_gba.make_window_fleet), the multi-chip production
        path; with mesh=None each window runs as it completes
        (single-device). Both paths run the identical window step.

        fleet_batch: windows per sharded call (default: mesh size)."""
        self.cfg = cfg
        self.kf_point_max = kf_point_max
        self._capacity = capacity
        self._unique_max = unique_max
        self._step_cache = {}
        self.mesh = mesh
        self._fleet_batch = (fleet_batch if fleet_batch is not None
                             else (mesh.size if mesh is not None else 1))
        self._fleet_cache = {}
        self._win_queue: list[list[Keyframe]] = []
        self.edges1: list[LoopEdge] = []
        self.edges2: list[LoopEdge] = []
        self.submaps: list[Keyframe] = []
        self._pending: list[Keyframe] = []
        # dispatch-ahead pipeline (single-device path): window N's step
        # outputs and condensed submap stay on device until window N+1
        # has been DISPATCHED, so the host-blocking readback of N
        # overlaps the device execution of N+1 (the reference's GBA
        # thread likewise overlaps with odometry, voxelslam.cpp:3018)
        self._inflight_step = None   # (window, device step outputs)
        self._inflight_cond = None   # (first_kf, down_dev, dmask_dev)
        self._fleet_inflight = None  # (queue, device fleet outputs)

    # -- device step --------------------------------------------------------

    def _map_cfgs(self, W: int):
        cfg = self.cfg
        g = cfg.gba
        coarse = MapConfig(
            voxel_size=g.voxel_size, max_layer=0,
            capacities=(self._capacity,), win_size=W,
            min_point=(5,), min_eigen_value=g.min_eigen_value,
            plane_thr=(g.eigen_value_thr,), unique_max=(self._unique_max,),
            eig_ratio_ba=cfg.map.eig_ratio_ba)
        fine = dataclasses.replace(
            coarse,
            voxel_size=cfg.map.voxel_size,
            min_eigen_value=cfg.map.min_eigen_value,
            plane_thr=(cfg.map.plane_thr[0],))
        return coarse, fine

    def _window_step(self, W: int, factor_max: int):
        """Jitted: (clouds (W,P,3), masks, Rs, ps, wmask) -> optimized
        poses + dense Hessian.

        Convergence-driven coarse->fine schedule (reference HBA_add_edge,
        voxelslam.cpp:2871-2917): each outer round rebuilds the voxel map
        at the current phase's parameters and runs a 3-iteration LM;
        coarse GBA voxel params run until the first |r0-r1|/r0 < 5%
        convergence, then the odometry map params take over until second
        convergence or `GBAConfig.total_max_iter` rounds. The voxel size
        and plane gates enter as traced scalars so one compiled while-
        loop body serves both phases."""
        coarse_cfg, fine_cfg = self._map_cfgs(W)
        g = self.cfg.gba
        total_iter = max(int(g.total_max_iter), 2)
        CONV_THR = 0.05

        def build_and_lm(vox, min_eig, thr, clouds, masks, Rs, ps, wmask):
            lv = vm.empty_level(self._capacity, W)
            mp = jnp.arange(W, dtype=jnp.int32)
            tr = jnp.zeros((clouds.shape[1],))
            for i in range(W):
                wld = clouds[i] @ Rs[i].T + ps[i]
                lv, _, _, _ = vm.insert_scan_level(
                    lv, vox, self._unique_max, wld, clouds[i], tr,
                    masks[i] * wmask[i], i, 0.0)
            levels = vm.refresh_planes((lv,), coarse_cfg, Rs, ps, mp, W,
                                       min_eigen_value=min_eig,
                                       plane_thr=thr)
            factors = vm.harvest_t(levels, coarse_cfg, mp, factor_max)
            return opt.lm_lidar(Rs, ps, factors, wmask, max_iter=3)

        def step(clouds, masks, Rs, ps, wmask):
            n6 = W * 6

            def cond(c):
                it, phase, *_ = c
                return (it < total_iter) & (phase < 2)

            def body(c):
                it, phase, Rs, ps, H, r0_first, r1_last = c
                fine = phase > 0
                vox = jnp.where(fine, fine_cfg.voxel_size, g.voxel_size)
                min_eig = jnp.where(fine, fine_cfg.min_eigen_value,
                                    g.min_eigen_value)
                thr = jnp.where(fine, fine_cfg.plane_thr[0],
                                g.eigen_value_thr)
                Rs2, ps2, H2, r0, r1, _ = build_and_lm(
                    vox, min_eig, thr, clouds, masks, Rs, ps, wmask)
                rel = jnp.abs(r0 - r1) / jnp.maximum(r0, 1e-12)
                phase2 = phase + (rel < CONV_THR).astype(jnp.int32)
                r0_first = jnp.where(it == 0, r0, r0_first)
                return (it + 1, phase2, Rs2, ps2, H2, r0_first, r1)

            H0 = jnp.zeros((n6, n6))
            c0 = (jnp.int32(0), jnp.int32(0), Rs, ps, H0,
                  jnp.float32(0.0), jnp.float32(0.0))
            it, phase, Rs, ps, H, r0, r1 = jax.lax.while_loop(cond, body, c0)
            return Rs, ps, H, r0, r1

        return step

    def _get_step(self, W: int, factor_max: int):
        key = (W, factor_max)
        if key not in self._step_cache:
            self._step_cache[key] = jax.jit(self._window_step(W, factor_max))
        return self._step_cache[key]

    def _get_fleet(self, W: int, factor_max: int):
        from ..parallel.dist_gba import make_window_fleet
        key = (W, factor_max)
        if key not in self._fleet_cache:
            self._fleet_cache[key] = make_window_fleet(
                self.mesh, self._window_step(W, factor_max), W,
                condense_vs=self.cfg.map.voxel_size / 8.0,
                point_max=self.kf_point_max)
        return self._fleet_cache[key]

    def _get_condense(self, W: int):
        """Jitted window condense for the single-device / total-BA
        paths (same device math as the fleet's in-call condense)."""
        from ..parallel.dist_gba import condense_window
        key = ("cond", W)
        if key not in self._step_cache:
            vs = self.cfg.map.voxel_size / 8.0
            self._step_cache[key] = jax.jit(partial(
                condense_window, vs=vs, P_out=self.kf_point_max))
        return self._step_cache[key]

    def _dispatch_window(self, kfs: list[Keyframe], W_pad: int,
                         factor_max: int = 1024):
        """Enqueue one window BA on device; returns the un-fetched
        device outputs (Rs2, ps2, H, r0, r1)."""
        P = self.kf_point_max
        clouds = np.zeros((W_pad, P, 3), np.float32)
        masks = np.zeros((W_pad, P), np.float32)
        Rs = np.tile(np.eye(3, dtype=np.float32), (W_pad, 1, 1))
        ps = np.zeros((W_pad, 3), np.float32)
        wmask = np.zeros((W_pad,), np.float32)
        for i, kf in enumerate(kfs):
            m = min(kf.cloud.shape[0], P)
            clouds[i, :m] = kf.cloud[:m]
            masks[i, :m] = kf.mask[:m]
            Rs[i] = kf.R0
            ps[i] = kf.p0
            wmask[i] = 1.0
        step = self._get_step(W_pad, factor_max)
        return step(jnp.array(clouds), jnp.array(masks), jnp.array(Rs),
                    jnp.array(ps), jnp.array(wmask))

    def _run_window(self, kfs: list[Keyframe], W_pad: int,
                    factor_max: int = 1024):
        """One window BA, synchronous; returns (xs_opt list, H numpy)."""
        n = len(kfs)
        Rs2, ps2, H, r0, r1 = self._dispatch_window(kfs, W_pad, factor_max)
        return (np.asarray(Rs2, np.float64)[:n],
                np.asarray(ps2, np.float64)[:n],
                np.asarray(H, np.float64), float(r0), float(r1))

    @staticmethod
    def _extract_edges(kfs, Rs, ps, H, out: list[LoopEdge]):
        """All-pairs edges with v6 = 1/|H_ij| elementwise
        (reference :2926-2951)."""
        n = len(kfs)
        for i in range(n - 1):
            for j in range(i + 1, n):
                hij = np.abs(np.array(
                    [H[6 * i + k, 6 * j + k] for k in range(6)]))
                if np.any(hij < 1e-6):
                    continue
                rel_R = Rs[i].T @ Rs[j]
                rel_p = Rs[i].T @ (ps[j] - ps[i])
                out.append(LoopEdge(
                    id_a=kfs[i].session, id_b=kfs[j].session,
                    ord_a=kfs[i].scan_id, ord_b=kfs[j].scan_id,
                    R=rel_R, t=rel_p, v6=1.0 / hij))

    def _dispatch_condense(self, kfs, Rs, ps):
        """Enqueue the window condense (merge into first-frame coords +
        downsample at voxel_size/8, reference :2954-2985); returns the
        un-fetched (down, dmask) device arrays."""
        P = self.kf_point_max
        n = len(kfs)
        clouds = np.zeros((n, P, 3), np.float32)
        masks = np.zeros((n, P), np.float32)
        for i, kf in enumerate(kfs):
            m = min(kf.cloud.shape[0], P)
            clouds[i, :m] = kf.cloud[:m]
            masks[i, :m] = kf.mask[:m]
        return self._get_condense(n)(
            jnp.array(clouds), jnp.array(masks),
            jnp.array(np.asarray(Rs[:n], np.float32)),
            jnp.array(np.asarray(ps[:n], np.float32)))

    def _condense(self, kfs, Rs, ps, kf_index: int | None = None) -> Keyframe:
        """Synchronous window condense — one jitted device call
        (dist_gba.condense_window); the fleet path computes the same
        thing inside its sharded call."""
        down, dmask = self._dispatch_condense(kfs, Rs, ps)
        first = kfs[0]
        return Keyframe(
            kf_index=len(self.submaps) if kf_index is None else kf_index,
            scan_id=first.scan_id,
            session=first.session, R0=Rs[0], p0=ps[0],
            cloud=np.asarray(down), mask=np.asarray(dmask, np.float32),
            jour=first.jour)

    # -- bottom-up ----------------------------------------------------------

    def _harvest_cond(self):
        """Fetch the in-flight condensed submap (completed long ago on
        the device FIFO) and append it in window order."""
        if self._inflight_cond is None:
            return
        first, down, dmask = self._inflight_cond
        self._inflight_cond = None
        self.submaps.append(Keyframe(
            kf_index=len(self.submaps), scan_id=first.scan_id,
            session=first.session, R0=first.R0, p0=first.p0,
            cloud=np.asarray(down), mask=np.asarray(dmask, np.float32),
            jour=first.jour))

    def _harvest_step(self, inflight):
        """Fetch one in-flight window BA (blocking readback that now
        overlaps the execution of the NEXT dispatched window), extract
        its all-pairs edges, and enqueue its condense."""
        window, (Rs2, ps2, H, r0, r1) = inflight
        n = len(window)
        Rs = np.asarray(Rs2, np.float64)[:n]
        ps = np.asarray(ps2, np.float64)[:n]
        self._extract_edges(window, Rs, ps, np.asarray(H, np.float64),
                            self.edges1)
        first = window[0]
        first = dataclasses.replace(first, R0=Rs[0], p0=ps[0])
        down, dmask = self._dispatch_condense(window, Rs, ps)
        _start_host_copies((down, dmask))
        self._inflight_cond = (first, down, dmask)
        return float(r0), float(r1)

    def drain(self):
        """Fetch everything still in flight (both pipeline stages and
        the fleet); called by flush()/total_ba()/top_down() so edge and
        submap lists are complete before they are consumed."""
        out = None
        if self._fleet_inflight is not None:
            out = self._harvest_fleet()
        if self._inflight_step is not None:
            self._harvest_cond()
            step, self._inflight_step = self._inflight_step, None
            r0, r1 = self._harvest_step(step)
            out = dict(r0=r0, r1=r1)
        self._harvest_cond()
        return out

    def add_keyframe(self, kf: Keyframe):
        """Stream one keyframe; a window BA is due whenever `win` have
        accumulated (stride `stride`), mirroring thd_globalmapping's
        continuous consumption (:3066-3096). Single-device: the window
        is DISPATCHED immediately and harvested when the next window
        dispatches (two-stage pipeline: step then condense), so wall
        time per window approaches device-busy time. With a mesh:
        windows queue and run `fleet_batch` at a time, sharded over
        axis "win", with the same dispatch-ahead batching."""
        g = self.cfg.gba
        self._pending.append(kf)
        if len(self._pending) < g.win_size:
            return None
        window = self._pending[:g.win_size]
        self._pending = self._pending[g.stride:]
        if self.mesh is not None:
            self._win_queue.append(window)
            if len(self._win_queue) >= self._fleet_batch:
                return self._flush_windows()
            return dict(queued=len(self._win_queue))
        outs = self._dispatch_window(window, g.win_size)
        _start_host_copies(outs)
        prev, self._inflight_step = self._inflight_step, (window, outs)
        r0 = r1 = None
        if prev is not None:
            self._harvest_cond()
            r0, r1 = self._harvest_step(prev)
        return dict(r0=r0, r1=r1, n_edges=len(self.edges1),
                    n_submaps=len(self.submaps), in_flight=True)

    def _flush_windows(self):
        """Dispatch all queued windows through the sharded fleet
        (padding the batch to a mesh-size multiple by repeating the
        first window; padded results are discarded), then harvest the
        PREVIOUS in-flight batch — its blocking readback overlaps the
        new batch's device execution."""
        if not self._win_queue:
            return self._harvest_fleet()
        g = self.cfg.gba
        W = g.win_size
        Pm = self.kf_point_max
        D = self.mesh.size if self.mesh is not None else 1
        queue, self._win_queue = self._win_queue, []
        n_real = len(queue)
        n_pad = (-n_real) % max(self._fleet_batch, D)
        batch = queue + [queue[0]] * n_pad
        Nb = len(batch)

        clouds = np.zeros((Nb, W, Pm, 3), np.float32)
        masks = np.zeros((Nb, W, Pm), np.float32)
        Rs = np.tile(np.eye(3, dtype=np.float32), (Nb, W, 1, 1))
        ps = np.zeros((Nb, W, 3), np.float32)
        wmask = np.ones((Nb, W), np.float32)
        for b, window in enumerate(batch):
            for i, kf in enumerate(window):
                m = min(kf.cloud.shape[0], Pm)
                clouds[b, i, :m] = kf.cloud[:m]
                masks[b, i, :m] = kf.mask[:m]
                Rs[b, i] = kf.R0
                ps[b, i] = kf.p0
        fleet = self._get_fleet(W, 1024)
        outs = fleet(jnp.array(clouds), jnp.array(masks), jnp.array(Rs),
                     jnp.array(ps), jnp.array(wmask))
        _start_host_copies(outs)
        prev, self._fleet_inflight = self._fleet_inflight, (queue, outs)
        if prev is None:
            return dict(dispatched=n_real)
        return self._harvest_fleet(prev)

    def _harvest_fleet(self, inflight=None):
        """Fetch one in-flight fleet batch and build its edge/submap
        records (default: the runner's current in-flight batch)."""
        if inflight is None:
            inflight, self._fleet_inflight = self._fleet_inflight, None
        if inflight is None:
            return None
        W = self.cfg.gba.win_size
        queue, (Rs2, ps2, rel_R, rel_p, v6, evalid, r0, r1,
                downs, dmasks) = inflight
        n_real = len(queue)
        Rs2 = np.asarray(Rs2, np.float64)
        ps2 = np.asarray(ps2, np.float64)
        rel_R = np.asarray(rel_R, np.float64)
        rel_p = np.asarray(rel_p, np.float64)
        v6 = np.asarray(v6, np.float64)
        evalid = np.asarray(evalid)
        downs = np.asarray(downs)
        dmasks = np.asarray(dmasks, np.float32)
        pi, pj = np.triu_indices(W, 1)
        for b, window in enumerate(queue):
            for m in range(len(pi)):
                if not evalid[b, m]:
                    continue
                a, c = window[pi[m]], window[pj[m]]
                self.edges1.append(LoopEdge(
                    id_a=a.session, id_b=c.session,
                    ord_a=a.scan_id, ord_b=c.scan_id,
                    R=rel_R[b, m], t=rel_p[b, m], v6=v6[b, m]))
            first = window[0]
            self.submaps.append(Keyframe(
                kf_index=len(self.submaps), scan_id=first.scan_id,
                session=first.session, R0=Rs2[b, 0], p0=ps2[b, 0],
                cloud=downs[b], mask=dmasks[b], jour=first.jour))
        return dict(flushed=n_real, r0=float(np.asarray(r0)[0]),
                    r1=float(np.asarray(r1)[0]),
                    n_edges=len(self.edges1),
                    n_submaps=len(self.submaps))

    def flush(self):
        """Run any queued windows and fetch everything in flight (end
        of stream / finish)."""
        out = self._flush_windows() if self.mesh is not None else None
        out2 = self.drain()
        return out2 if out2 is not None else out

    def bottom_up(self, keyframes):
        for kf in keyframes:
            self.add_keyframe(kf)
        self.flush()

    # -- total BA over submaps ----------------------------------------------

    def total_ba(self, max_window: int = 64):
        """Second-level BA over ALL submaps (reference total_ba burst at
        :3108-3126, run with total_max_iter rounds).

        No silent cap: when more than `max_window` submaps exist, they
        are recursively condensed in non-overlapping `win_size` windows
        (each window BA'd, its edges kept) until one window covers the
        whole level — every submap contributes edges at every level."""
        self.drain()
        if len(self.submaps) < 2:
            return None
        g = self.cfg.gba
        level = list(self.submaps)
        rounds = 0
        while len(level) > max_window:
            nxt = []
            for i in range(0, len(level), g.win_size):
                window = level[i:i + g.win_size]
                if len(window) < 2:
                    nxt.extend(window)
                    continue
                Rs, ps, H, _, _ = self._run_window(
                    window, _next_pow2(len(window)), factor_max=2048)
                self._extract_edges(window, Rs, ps, H, self.edges2)
                nxt.append(self._condense(window, Rs, ps, kf_index=-1))
            level = nxt
            rounds += 1
        W_pad = _next_pow2(len(level))
        Rs, ps, H, r0, r1 = self._run_window(level, W_pad, factor_max=2048)
        self._extract_edges(level, Rs, ps, H, self.edges2)
        return dict(r0=r0, r1=r1, n_edges=len(self.edges2),
                    hierarchy_rounds=rounds)

    # -- top-down -----------------------------------------------------------

    def top_down(self, loop_pipeline):
        """Merge all HBA edges into the multi-session scan pose graph and
        solve (reference topDownProcess :2717-2812). Updates every
        session's scan poses and keyframes in place via the loop
        pipeline's solver; returns its LoopCorrection."""
        self.drain()
        lp = loop_pipeline
        lp.lp_edges.extend(self.edges1)
        lp.lp_edges.extend(self.edges2)
        lp._rebuild_graph_ids()
        return lp._optimize(g_update=False)


def _start_host_copies(arrs) -> None:
    """Begin async device->host transfers for freshly dispatched
    outputs: the D2H starts as soon as each buffer is produced and
    rides under the NEXT window's device execution, so the later
    blocking np.asarray harvest is (tunnel-)RTT-free. Best effort —
    backends without the API just pay the copy at harvest."""
    for a in arrs:
        try:
            a.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
