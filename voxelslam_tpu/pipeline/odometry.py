"""Odometry + local-mapping pipeline (the reference's main thread).

Capability parity with `VOXEL_SLam::thd_odometry_localmapping`
(voxelslam.cpp:1740-2067 in the reference tree) restructured as a
deterministic per-scan step:

  scan -> EKF propagate + de-skew -> voxel downsample -> iEKF update vs
  map (divergence gate) -> window push (insert + preintegration) ->
  plane refresh -> [window full] sliding-window LI-BA -> marginalize ->
  slide

plus the initialization phase (EKF + kNN-LIO accumulation, then the
multi-round dynamic init with joint gravity optimization — reference
`initialization`/`Initialization::motion_init`, voxelslam.cpp:460-819,
1450-1534) and `system_reset` divergence recovery (voxelslam.cpp:
1537-1586), which starts a new session.

Host code only shuffles numpy buffers and decides phases; all math runs
in a handful of jitted step functions with static shapes from the
config.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..core import so3
from ..core.state import NavState, DIM
from ..core.eig3 import eigvalsh3
from ..imu import ekf, preintegration as pre
from ..map import voxel_map as vm
from ..ba import optimizers as opt
from ..odom import iekf
from ..ops.downsample import voxel_downsample


def _stack(trees):
    return jax.tree.map(lambda *x: jnp.stack(x), *trees)


def _pin_window_layouts(levels):
    """Pin C-minor physical layouts on the per-window voxel arrays.

    Inside the fused scan step XLA chooses a W-minor layout for the
    (W, C, 3[,3]) window stores (W=10 padded to 128 lanes -> 12.8x
    wasted bandwidth on every window-slot dynamic-update-slice, the
    dominant cost of the fused step as traced on TPU). Pinning the
    size-3 component dims major and the capacity dim minor keeps the
    lanes dense: physical (3[,3], W, C). The fixed-cluster arrays
    (C, 3[,3]) get the same treatment — traced unpinned, XLA flip-flops
    them between C-minor and row-major across the insert/marginalize/
    refresh consumers, paying ~1 ms relayout copies per direction."""
    try:
        from jax.experimental.layout import Layout, with_layout_constraint
    except ImportError:  # older jax: let XLA choose
        return levels

    def pin(a):
        if a.ndim == 4:      # (W, C, 3, 3) -> physical (3, 3, W, C)
            lay = Layout((2, 3, 0, 1))
        elif a.ndim == 3:    # (W, C, 3)    -> physical (3, W, C)
            lay = Layout((2, 0, 1))
        elif a.ndim == 2:    # (W, C)       -> row-major (lane = C)
            lay = Layout((0, 1))
        else:
            return a
        return with_layout_constraint(a, lay)

    def pin_fix(a):
        if a.ndim == 3:      # (C, 3, 3) -> physical (3, 3, C)
            lay = Layout((1, 2, 0))
        elif a.ndim == 2:    # (C, 3)    -> physical (3, C)
            lay = Layout((1, 0))
        else:
            return a
        return with_layout_constraint(a, lay)

    # tuple, not list: the K-scan fused dispatch carries `levels`
    # through lax.scan, whose carry pytree structure must match
    # tot stays UNPINNED: its consumers are full-table elementwise
    # merges (layout-agnostic) and the touched-refresh ROW gathers,
    # which need row-major contiguity — a C-minor pin made the fused
    # step's refresh ~10x slower than the same gathers unpinned
    return tuple(dataclasses.replace(
        lv, win=jax.tree.map(pin, lv.win), win_nv=pin(lv.win_nv),
        fix=jax.tree.map(pin_fix, lv.fix))
        for lv in levels)


@dataclasses.dataclass
class ScanPose:
    """Output stream element (reference loop_refine.hpp:17-45)."""
    t: float
    R: np.ndarray
    p: np.ndarray
    v: np.ndarray
    v6: np.ndarray          # per-scan variance 6-vector from the BA Hessian
    cloud: np.ndarray       # downsampled body-frame cloud
    cloud_mask: np.ndarray
    session: int
    # IMU biases + gravity at this scan — persisted in alidarState.txt
    # (reference save_pose writes the full 26-column IMUST row,
    # voxelslam.cpp:181-204)
    bg: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    ba: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3))
    g: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.0, -9.81]))


class SlamPipeline:
    """Streaming LiDAR-inertial SLAM front end."""

    def __init__(self, cfg: SlamConfig, collect_clouds: bool = True):
        self.cfg = cfg
        # when False, skip the per-scan device->host cloud fetch (loop
        # closure disabled); saves ~50-100 ms/scan on tunneled devices
        self.collect_clouds = collect_clouds
        W = cfg.lba.win_size
        P = cfg.odom.point_max

        self.noise_meas = jnp.diag(jnp.array(
            [cfg.lba.noise_gyr] * 3 + [cfg.lba.noise_acc] * 3, jnp.float32))
        self.noise_walk = jnp.diag(jnp.array(
            [cfg.lba.walk_gyr] * 3 + [cfg.lba.walk_acc] * 3, jnp.float32))
        self.R_ext = jnp.array(cfg.extrinsic_R, jnp.float32).reshape(3, 3)
        self.t_ext = jnp.array(cfg.extrinsic_t, jnp.float32)

        self._jit_prop_deskew = jax.jit(self._prop_deskew)
        self._jit_downsample = jax.jit(self._downsample_var)
        self._jit_kdtree_step = jax.jit(self._kdtree_step)
        self._jit_steady = jax.jit(self._steady_scan)
        self._jit_push = jax.jit(self._push_window)
        self._jit_ba_slide = jax.jit(self._window_ba_slide)
        self._jit_init_round = jax.jit(self._init_round)
        self._jit_align = jax.jit(self._align_gravity)
        self._jit_g_reloc = jax.jit(self._g_reloc)
        self._jit_integrate = jax.jit(self._integrate_preint)
        self._jit_refresh = jax.jit(self._refresh)
        self._jit_push_fixed = jax.jit(self._push_fixed)
        self._jit_push_fixed_refresh = jax.jit(self._push_fixed_refresh)
        self._jit_occ_counts = jax.jit(
            lambda levels: jnp.stack([jnp.sum(lv.occ) for lv in levels]))
        self._jit_evict = jax.jit(
            lambda levels, jour: vm.evict(levels, jour,
                                          self.cfg.map.evict_dist))
        # NOTE: the stats ring (arg 5) is deliberately NOT donated — the
        # deferred-emission fetch holds the previous ring buffer while
        # later scans dispatch; donation would hand that buffer back to
        # XLA and invalidate the pending read (it is ~600 bytes).
        self._jit_megastep = jax.jit(self._steady_megastep,
                                     donate_argnums=(1, 2, 4))
        self._jit_megastep_k = jax.jit(self._steady_megastep_k,
                                       donate_argnums=(1, 2, 4))
        self._jit_mega_accum = jax.jit(self._mega_accum,
                                       donate_argnums=(1, 2, 4))

        self.reset(session=0, hard=True)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def reset(self, session: int, hard: bool = False):
        """System reset: drop map and window, new session (reference
        system_reset, voxelslam.cpp:1537-1586). IMU stays initialized."""
        cfg = self.cfg
        W = cfg.lba.win_size
        P = cfg.odom.point_max
        self.levels = vm.empty_map(cfg.map)
        self.x = NavState.identity()
        if not hard and getattr(self, "_gravity", None) is not None:
            self.x = dataclasses.replace(
                self.x, g=self._gravity, bg=self._bg0,
                p=jnp.array([0.0, 0.0, 30.0]))  # reference :1553
        self.win = _stack([NavState.identity() for _ in range(W)])
        self.mp = jnp.arange(W, dtype=jnp.int32)
        self.win_count = 0
        self.preints = None          # built lazily as a list, stacked for BA
        self._preint_list = []
        self.scan_buf = np.zeros((W, P, 3), np.float32)
        self.scan_mask = np.zeros((W, P), np.float32)
        self.scan_tr = np.zeros((W, P, vm.NV), np.float32)
        M = cfg.odom.imu_max - 1
        self.imu_buf_g = np.zeros((W, M, 3), np.float32)
        self.imu_buf_a = np.zeros((W, M, 3), np.float32)
        self.imu_buf_dt = np.zeros((W, M), np.float32)
        self.imu_buf_m = np.zeros((W, M), np.float32)
        self.degrade_cnt = 0
        self._last_p = None
        self._pending = None
        # on-device stats ring: K scans' packed stats gather on device;
        # one host fetch per K scans (tunnel round-trips dominate the
        # per-scan host cost otherwise). Cloud collection needs per-scan
        # fetches anyway, so the ring is 1 there.
        self._ring_K = 1 if self.collect_clouds else max(
            1, cfg.odom.stats_ring)
        mg = cfg.lba.mgsize
        # K-scan fused dispatch (see _steady_megastep_k): only in the
        # plain steady flow — cloud collection and mgsize>1 need
        # per-scan host decisions between device calls
        self._batch_K = 1 if (self.collect_clouds or mg > 1) else max(
            1, cfg.odom.batch_scans)
        self._scan_queue: list = []
        self._stats_len = 5 + 31 * mg + 1
        self._stats_ring = jnp.zeros((self._ring_K, self._stats_len))
        self._ring_fill = 0
        self._pend_t: list[float] = []
        self.session = session
        self.jour = 0.0
        self.init_done = False
        self.scan_count = 0
        self.last_scan_end = None
        # init-phase reference cloud
        self.init_cloud = jnp.zeros((4 * P, 3), jnp.float32)
        self.init_cloud_mask = jnp.zeros((4 * P,), jnp.float32)
        if hard:
            self.scan_poses: list[ScanPose] = []
            self._gravity = None
            self._bg0 = jnp.zeros(3)
            self._scale_gravity = 1.0
            self._imu_acc = []
            self._imu_gyr = []

    # ------------------------------------------------------------------
    # jitted pieces
    # ------------------------------------------------------------------

    def _prop_deskew(self, state, imu_ts, gyr, acc, imu_mask, scan_beg,
                     scan_end, last_end, pts, offsets, pt_mask):
        cfg = self.cfg.odom
        covd = lambda v: jnp.full((3,), v, jnp.float32)
        st, poses = ekf.propagate(
            state, imu_ts, gyr, acc, imu_mask, scan_beg, scan_end, last_end,
            covd(cfg.cov_gyr), covd(cfg.cov_acc),
            covd(cfg.cov_bias_gyr), covd(cfg.cov_bias_acc))
        if self.cfg.odom.point_notime:
            des = pts
        else:
            des = ekf.deskew(pts, offsets, poses, st, self.R_ext, self.t_ext)
        # LiDAR frame -> body (IMU) frame
        body = des @ self.R_ext.T + self.t_ext
        return st, body

    def _downsample_var(self, pts_body, mask):
        cfg = self.cfg.odom
        down, dmask, _ = voxel_downsample(pts_body, mask, cfg.down_size,
                                          self.cfg.odom.point_max)
        var_b = iekf.point_var_body(down, cfg.dept_err, cfg.beam_err)
        # (P, NV) anisotropic noise records for the map accumulators
        # (rank-1 + isotropic decomposition of var_b — voxel_map module
        # docstring); body-frame directions, rotated at refresh
        nv = vm.point_noise_record(down, cfg.dept_err, cfg.beam_err)
        return down, dmask.astype(jnp.float32), var_b, nv

    def _kdtree_step(self, state, ref_cloud, ref_mask, pts, mask):
        st = iekf.iekf_update_kdtree(state, ref_cloud, ref_mask, pts, mask)
        # append world points into the init cloud buffer (ring-style)
        wld = pts @ st.R.T + st.p
        buf = jnp.concatenate([ref_cloud, wld], axis=0)
        bmask = jnp.concatenate([ref_mask, mask], axis=0)
        down, dmask, _ = voxel_downsample(buf, bmask, 0.5, ref_cloud.shape[0])
        return st, down, dmask.astype(jnp.float32)

    def _steady_scan(self, state, levels, pts, mask, var_b, tr):
        st, ok, diag = iekf.iekf_update(
            state, levels, self.cfg.map, pts, var_b, mask,
            max_iter=self.cfg.odom.max_iter,
            degrade_eig=self.cfg.odom.degrade_eig)
        return st, ok, diag

    def _push_window(self, levels, state, pts, mask, tr, frame_slot, jour):
        wld = pts @ state.R.T + state.p
        levels = vm.insert_scan(levels, self.cfg.map, wld, pts, tr, mask,
                                frame_slot, jour)
        return levels

    def _refresh(self, levels, win, mp, win_count):
        return vm.refresh_planes(levels, self.cfg.map, win.R, win.p, mp,
                                 win_count)

    def _integrate_preint(self, gyr, acc, dt, mask, bg, ba):
        return pre.integrate(gyr, acc, dt, mask, bg, ba,
                             self.noise_meas, self.noise_walk)

    def _window_ba_slide(self, levels, win, preints, mp):
        cfg = self.cfg
        W = cfg.lba.win_size
        mg = cfg.lba.mgsize
        factors = vm.harvest_t(levels, cfg.map, mp, cfg.lba.factor_max)
        win_mask = jnp.ones((W,))
        new_win, H, r0, r1, conv = opt.lm_li(
            win, factors, preints, win_mask, imu_coef=cfg.lba.imu_coef,
            max_iter=cfg.lba.max_iter)
        # per-scan variance from each EMITTED frame's BA Hessian pose
        # block (reference :1974-1980; frames 0..mg-1 leave the window)
        d = jnp.stack([jnp.diag(H)[k * DIM:k * DIM + 6]
                       for k in range(mg)])               # (mg, 6)
        v6 = 1.0 / jnp.maximum(jnp.abs(d), 1e-6)
        # refresh planes with optimized states, then marginalize
        levels = vm.refresh_planes(levels, cfg.map, new_win.R, new_win.p, mp, W)
        levels = vm.marginalize(levels, cfg.map, new_win.R, new_win.p, mp,
                                W, mg)
        mp_new = jnp.concatenate([mp[mg:], mp[:mg]])
        win_shift = jax.tree.map(
            lambda a: jnp.concatenate([a[mg:], a[:mg]], axis=0), new_win)
        return levels, new_win, win_shift, mp_new, v6, r0, r1

    def _steady_megastep(self, state, levels, win, mp, preints, ring,
                         imu_blob, scan_blob, scal):
        """One fused steady-phase scan: propagate+deskew -> downsample ->
        preintegrate -> iEKF -> window push + insert -> plane refresh ->
        windowed LI-BA -> marginalize -> slide. Single device call per
        scan (the reference spreads this over its main thread + 5-thread
        pools; on TPU one fused graph keeps everything on-chip).

        Window invariant at entry: logical frames 0..W-2 are valid, the
        new scan becomes frame W-1; `preints` (W-1,) holds the previous
        window's intervals (front entry is retired by the shift).
        """
        cfg = self.cfg
        W = cfg.lba.win_size
        mg = cfg.lba.mgsize
        imu_ts, gyr, acc, imask = (imu_blob[:, 0], imu_blob[:, 1:4],
                                   imu_blob[:, 4:7], imu_blob[:, 7])
        pts, offsets, pmask = (scan_blob[:, 0:3], scan_blob[:, 3],
                               scan_blob[:, 4])
        scan_beg, scan_end, last_end, jour = scal[0], scal[1], scal[2], scal[3]
        slot = scal[4].astype(jnp.int32)
        levels = _pin_window_layouts(levels)

        # 1) propagate + deskew + downsample
        x_prop, body = self._prop_deskew(state, imu_ts, gyr, acc, imask,
                                         scan_beg, scan_end, last_end,
                                         pts, offsets, pmask)
        down, dmask, var_b, tr = self._downsample_var(body, pmask)

        # 2) preintegration over exactly (last_end, scan_end].
        # Invariant: preints[k] <-> pair (k, k+1) of the CURRENT logical
        # window (the slide at the end of this step re-shifts); the new
        # scan fills slot W-1, so its interval lands at pair W-2.
        g_mid = 0.5 * (gyr[:-1] + gyr[1:])
        a_mid = 0.5 * (acc[:-1] + acc[1:])
        heads = jnp.clip(imu_ts[:-1], last_end, scan_end)
        tails = jnp.clip(imu_ts[1:], last_end, scan_end)
        dtp = (tails - heads) * (imask[:-1] * imask[1:])
        p_new = pre.integrate(g_mid, a_mid, dtp, imask[1:],
                              x_prop.bg, x_prop.ba,
                              self.noise_meas, self.noise_walk)
        preints = jax.tree.map(
            lambda a, b: a.at[W - 2].set(b), preints, p_new)

        # 3) iterated-EKF update vs the map
        st, ok, diag = iekf.iekf_update(
            x_prop, levels, cfg.map, down, var_b, dmask,
            max_iter=cfg.odom.max_iter, degrade_eig=cfg.odom.degrade_eig)

        # 4) push into window slot mp[W-1]
        win = jax.tree.map(lambda a, b: a.at[W - 1].set(b), win, st)
        wld = down @ st.R.T + st.p
        levels, touched = vm.insert_scan_fused(
            levels, cfg.map, wld, down, tr, dmask, mp[W - 1], jour,
            st.R, st.p)

        # 5) incremental plane refresh: only voxels touched by this scan
        #    (the reference's multi_recut over the updated octree set,
        #    voxelslam.cpp:1682-1737 — untouched planes stay as-is)
        levels = vm.refresh_planes(levels, cfg.map, win.R, win.p, mp, W,
                                   touched=touched)

        # 6) windowed LI-BA
        factors = vm.harvest_t(levels, cfg.map, mp, cfg.lba.factor_max)
        new_win, H, r0, r1, conv = opt.lm_li(
            win, factors, preints, jnp.ones((W,)),
            imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter)
        # per-EMITTED-frame variance from that frame's Hessian pose
        # block (reference voxelslam.cpp:1974-1980 takes the frame-0
        # block; with mgsize>1 each marginalized frame gets its own)
        d6 = jnp.stack([jnp.diag(H)[k * DIM:k * DIM + 6]
                        for k in range(mg)])              # (mg, 6)
        v6 = 1.0 / jnp.maximum(jnp.abs(d6), 1e-6)

        # 7) marginalize with optimized poses, slide (plane params of
        #    marginalized voxels refresh on their next touch, matching
        #    the reference's margi plane-update-on-new-points)
        levels = vm.marginalize(levels, cfg.map, new_win.R, new_win.p,
                                mp, W, mg)
        levels = _pin_window_layouts(levels)
        mp_new = jnp.concatenate([mp[mg:], mp[:mg]])
        emitted = new_win[slice(0, mg)]
        win_next = jax.tree.map(
            lambda a: jnp.concatenate([a[mg:], a[:mg]], axis=0), new_win)
        # slide the preint pairs with the window (stale tail entries are
        # overwritten during the next accumulate/fill scans)
        preints = jax.tree.map(
            lambda a: jnp.concatenate([a[mg:], a[:mg]], axis=0), preints)
        x_out = new_win[W - 1]
        # hash-overflow observability: unique keys this scan whose probe
        # chain exhausted (silently sparsified otherwise)
        dropped = jnp.sum(jnp.stack([t[2] for t in touched]))
        # pack all small outputs into one vector -> one host fetch per scan
        stats = jnp.concatenate([
            jnp.stack([ok.astype(jnp.float32),
                       diag["matches"].astype(jnp.float32),
                       diag["nnt_eig"][0], r0, r1]),
            v6.reshape(-1),
            emitted.t.reshape(-1),
            emitted.R.reshape(-1),
            emitted.p.reshape(-1),
            emitted.v.reshape(-1),
            emitted.bg.reshape(-1),
            emitted.ba.reshape(-1),
            emitted.g.reshape(-1),
            jnp.stack([dropped.astype(jnp.float32)]),
        ])
        ring = jax.lax.dynamic_update_slice(ring, stats[None], (slot, 0))
        return (x_out, levels, win_next, mp_new, preints, ring,
                down, dmask, tr)

    def _steady_megastep_k(self, state, levels, win, mp, preints,
                           imu_blobs, scan_blobs, scals):
        """K steady scans in ONE device call: `lax.scan` over the
        single-scan megastep body. On tunneled backends one dispatch
        costs ~a full host<->device RTT (~12 ms measured) while the
        megastep is ~10 ms device-busy — per-scan dispatch leaves the
        chip idle half the time. Batching K scans amortizes the RTT to
        RTT/K. Per-scan stats land in a fresh (K, S) stack (row k =
        scan k; replaces the ring carry) and the downsampled clouds
        come back stacked (K, P, ...) for one deferred readback.

        imu_blobs: (K, I, 8); scan_blobs: (K, P, 5); scals: (K, 5)
        with scals[k, 4] = k (the stats row).
        """
        K = scals.shape[0]
        ring0 = jnp.zeros((K, self._stats_len))

        def body(carry, xs):
            x, levels, win, mp, preints, ring = carry
            imu_b, scan_b, scal = xs
            (x, levels, win, mp, preints, ring, down, dmask, tr) = \
                self._steady_megastep(x, levels, win, mp, preints, ring,
                                      imu_b, scan_b, scal)
            return (x, levels, win, mp, preints, ring), (down, dmask, tr)

        carry, ys = jax.lax.scan(
            body, (state, levels, win, mp, preints, ring0),
            (imu_blobs, scan_blobs, scals))
        x, levels, win, mp, preints, ring = carry
        downs, dmasks, trs = ys
        return x, levels, win, mp, preints, ring, downs, dmasks, trs

    def _mega_accum(self, state, levels, win, mp, preints, imu_blob,
                    scan_blob, scal, frame_idx):
        """Window-refill scan for lba.mgsize > 1: propagate + deskew +
        downsample + preintegrate + iEKF + push into logical slot
        `frame_idx` + incremental refresh — NO BA/marginalize/slide (the
        reference only optimizes when win_count reaches win_size,
        voxelslam.cpp:1951; with mgsize>1 the window refills over
        mgsize-1 scans between BA bursts)."""
        cfg = self.cfg
        imu_ts, gyr, acc, imask = (imu_blob[:, 0], imu_blob[:, 1:4],
                                   imu_blob[:, 4:7], imu_blob[:, 7])
        pts, offsets, pmask = (scan_blob[:, 0:3], scan_blob[:, 3],
                               scan_blob[:, 4])
        scan_beg, scan_end, last_end, jour = scal[0], scal[1], scal[2], scal[3]
        levels = _pin_window_layouts(levels)

        x_prop, body = self._prop_deskew(state, imu_ts, gyr, acc, imask,
                                         scan_beg, scan_end, last_end,
                                         pts, offsets, pmask)
        down, dmask, var_b, tr = self._downsample_var(body, pmask)

        g_mid = 0.5 * (gyr[:-1] + gyr[1:])
        a_mid = 0.5 * (acc[:-1] + acc[1:])
        heads = jnp.clip(imu_ts[:-1], last_end, scan_end)
        tails = jnp.clip(imu_ts[1:], last_end, scan_end)
        dtp = (tails - heads) * (imask[:-1] * imask[1:])
        p_new = pre.integrate(g_mid, a_mid, dtp, imask[1:],
                              x_prop.bg, x_prop.ba,
                              self.noise_meas, self.noise_walk)
        preints = jax.tree.map(
            lambda a, b: a.at[frame_idx - 1].set(b), preints, p_new)

        st, ok, diag = iekf.iekf_update(
            x_prop, levels, cfg.map, down, var_b, dmask,
            max_iter=cfg.odom.max_iter, degrade_eig=cfg.odom.degrade_eig)

        win = jax.tree.map(lambda a, b: a.at[frame_idx].set(b), win, st)
        wld = down @ st.R.T + st.p
        levels, touched = vm.insert_scan_fused(
            levels, cfg.map, wld, down, tr, dmask, mp[frame_idx], jour,
            st.R, st.p)
        levels = vm.refresh_planes(levels, cfg.map, win.R, win.p, mp,
                                   frame_idx + 1, touched=touched)
        levels = _pin_window_layouts(levels)
        dropped = jnp.sum(jnp.stack([t[2] for t in touched]))
        stats = jnp.stack([ok.astype(jnp.float32),
                           diag["matches"].astype(jnp.float32),
                           diag["nnt_eig"][0],
                           dropped.astype(jnp.float32)])
        return st, levels, win, preints, stats, down, dmask, tr

    def _init_round(self, scans, masks, trs, states, imu_g, imu_a, imu_dt,
                    imu_m, min_eig, plane_thr):
        """One dynamic-init round: re-integrate preintegrations at the
        current bias estimates (reference recreates IMU_PRE each round,
        voxelslam.cpp:728), rebuild a fresh map from the window scans at
        current states, then LI-BA with gravity (reference motion_init
        inner loop, voxelslam.cpp:649-731).

        min_eig / plane_thr are traced scalars: the relaxed first phase
        and the tightened post-alignment second phase (reference
        converge_flag==1 restores the production thresholds,
        voxelslam.cpp:644-648) share one compiled round."""
        cfg = self.cfg
        W = cfg.lba.win_size
        preints = jax.vmap(
            lambda g, a, dt, m, bg, ba: pre.integrate(
                g, a, dt, m, bg, ba, self.noise_meas, self.noise_walk)
        )(imu_g[1:], imu_a[1:], imu_dt[1:], imu_m[1:],
          states.bg[:W - 1], states.ba[:W - 1])
        icfg = dataclasses.replace(
            cfg.map, capacities=tuple(min(c, 1 << 13) for c in cfg.map.capacities))
        levels = vm.empty_map(icfg)
        mp = jnp.arange(W, dtype=jnp.int32)
        for i in range(W):
            wld = scans[i] @ states.R[i].T + states.p[i]
            levels = vm.insert_scan(levels, icfg, wld, scans[i], trs[i],
                                    masks[i], i)
        levels = vm.refresh_planes(
            levels, icfg, states.R, states.p, mp, W,
            min_eigen_value=min_eig,
            plane_thr=plane_thr)
        factors = vm.harvest_t(levels, icfg, mp, cfg.lba.factor_max)
        new_states, H, r0, r1, conv = opt.lm_li_gravity(
            states, factors, preints, jnp.ones((W,)),
            imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter,
            g_prior_w=cfg.init.gravity_prior_weight)
        # degeneracy: Gram matrix of detected plane normals
        # (reference voxelslam.cpp:734-758 uses matched normals)
        nrm = []
        for lv in levels:
            nrm.append(jnp.where((lv.state == vm.STATE_PLANE)[:, None],
                                 lv.normal, 0.0))
        nmat = jnp.concatenate(nrm, axis=0)
        gram = nmat.T @ nmat
        ev = eigvalsh3(gram)
        return new_states, r0, r1, ev[0]

    def _align_gravity(self, states):
        """Rotate the whole window so gravity is -z (reference
        align_gravity, voxelslam.cpp:470-496)."""
        g = states.g[0]
        gn = jnp.linalg.norm(g)
        target = jnp.array([0.0, 0.0, -1.0]) * gn
        axis = jnp.cross(g, target)
        s = jnp.linalg.norm(axis)
        c = jnp.dot(g, target)
        ang = jnp.arctan2(s, jnp.maximum(c, -gn * gn))
        axis = axis / jnp.maximum(s, 1e-9)
        R_al = so3.exp(axis * ang)
        p0 = states.p[0]
        new = dataclasses.replace(
            states,
            R=R_al[None] @ states.R,
            p=jnp.einsum("ij,nj->ni", R_al, states.p - p0[None]),
            v=jnp.einsum("ij,nj->ni", R_al, states.v),
            g=jnp.broadcast_to(target, states.g.shape),
        )
        return new

    def _g_reloc(self, levels, win, preints, mp, win_count):
        """Gravity-joint window re-optimization after a g_update loop
        correction (reference: loop_update sets g_update=2 and the next
        window BA runs LI_BA_OptimizerGravity with 5 iterations,
        voxelslam.cpp:1366-1367, 1956-1965). Runs on the rebuilt map
        with the valid window prefix; dead frames/pairs masked."""
        cfg = self.cfg
        W = cfg.lba.win_size
        factors = vm.harvest_t(levels, cfg.map, mp, cfg.lba.factor_max)
        wmask = (jnp.arange(W) < win_count).astype(jnp.float32)
        pmask = (jnp.arange(W - 1) < win_count - 1).astype(jnp.float32)
        new_win, H, r0, r1, conv = opt.lm_li_gravity(
            win, factors, preints, wmask, imu_coef=cfg.lba.imu_coef,
            max_iter=5, pair_mask=pmask)
        return new_win, r0, r1

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def _pad_points(self, pts, offsets=None):
        P = self.cfg.odom.point_max
        n = min(len(pts), P)
        out = np.zeros((P, 3), np.float32)
        out[:n] = pts[:n]
        msk = np.zeros((P,), np.float32)
        msk[:n] = 1.0
        off = np.zeros((P,), np.float32)
        if offsets is not None:
            off[:n] = offsets[:n]
        return out, off, msk

    def _pad_imu(self, ts, gyr, acc):
        M = self.cfg.odom.imu_max
        n = min(len(ts), M)
        t = np.zeros((M,), np.float32)
        g = np.zeros((M, 3), np.float32)
        a = np.zeros((M, 3), np.float32)
        m = np.zeros((M,), np.float32)
        t[:n], g[:n], a[:n], m[:n] = ts[:n], gyr[:n], acc[:n], 1.0
        # pad times with the last valid time to keep searchsorted sane
        if n:
            t[n:] = ts[n - 1]
        return t, g, a, m

    def process_scan(self, points, offsets, imu_ts, imu_gyr, imu_acc,
                     t_beg, t_end):
        """Feed one synchronized packet (reference sync_packages output).

        points: (N, 3) LiDAR-frame; offsets: (N,) seconds from t_beg;
        imu_*: IMU samples covering (last_end, t_end].
        Returns a status dict.
        """
        cfg = self.cfg
        W = cfg.lba.win_size

        # --- IMU static init (reference IMUEKF::IMU_init) ---
        if self._gravity is None:
            self._imu_acc.extend(np.asarray(imu_acc))
            self._imu_gyr.extend(np.asarray(imu_gyr))
            if len(self._imu_acc) > cfg.init.min_imu_num:
                acc = jnp.array(np.stack(self._imu_acc), jnp.float32)
                gyr = jnp.array(np.stack(self._imu_gyr), jnp.float32)
                g, mg, scale, _ = ekf.static_init(
                    acc, gyr, jnp.ones(acc.shape[0]),
                    livox_g_normalized=(cfg.lidar_type == "livox"))
                self._gravity = g
                self._scale_gravity = float(scale)
                self.x = dataclasses.replace(self.x, g=g)
            self.last_scan_end = t_end
            return {"phase": "imu_init"}

        # g-normalized Livox IMUs report acc in units of g: scale every
        # sample to SI at ingestion, the single point all downstream
        # propagation AND preintegration consume (the reference instead
        # multiplies inside motion_blur and push_imu via scale_gravity /
        # imupre_scale_gravity, ekf_imu.hpp:199-209, voxelslam.cpp:1465
        # — same effect, one site)
        if self._scale_gravity != 1.0:
            imu_acc = np.asarray(imu_acc, np.float64) * self._scale_gravity

        pts_j, off_j, pmask = self._pad_points(points, offsets)
        ts_j, gyr_j, acc_j, imask = self._pad_imu(imu_ts, imu_gyr, imu_acc)
        last_end = self.last_scan_end if self.last_scan_end is not None else t_beg
        self.last_scan_end = t_end

        if self.init_done:
            return self._process_steady_fused(
                ts_j, gyr_j, acc_j, imask, t_beg, t_end, last_end,
                pts_j, off_j, pmask)

        # --- init phase: separate (non-fused) steps ---
        pts_j, off_j, pmask = jnp.array(pts_j), jnp.array(off_j), jnp.array(pmask)
        ts_j, gyr_j, acc_j, imask = (jnp.array(ts_j), jnp.array(gyr_j),
                                     jnp.array(acc_j), jnp.array(imask))
        x_prop, body = self._jit_prop_deskew(
            self.x, ts_j, gyr_j, acc_j, imask, t_beg, t_end, last_end,
            pts_j, off_j, pmask)
        down, dmask, var_b, tr = self._jit_downsample(body, pmask)

        # preintegration over exactly (last_end, t_end] (the reference
        # rewrites the boundary IMU stamps the same way,
        # ekf_imu.hpp:125-133)
        g_mid = 0.5 * (gyr_j[:-1] + gyr_j[1:])
        a_mid = 0.5 * (acc_j[:-1] + acc_j[1:])
        heads = jnp.clip(ts_j[:-1], float(last_end), float(t_end))
        tails = jnp.clip(ts_j[1:], float(last_end), float(t_end))
        dt = (tails - heads) * (imask[:-1] * imask[1:])
        p_int = self._jit_integrate(g_mid, a_mid, dt, imask[1:],
                                    x_prop.bg, x_prop.ba)
        self._last_imu_mid = (np.asarray(g_mid), np.asarray(a_mid),
                              np.asarray(dt), np.asarray(imask[1:]))
        return self._process_init(x_prop, down, dmask, var_b, tr, p_int,
                                  t_end)

    # --- init phase -----------------------------------------------------

    def _process_init(self, x_prop, down, dmask, var_b, tr, p_int, t_end):
        cfg = self.cfg
        W = cfg.lba.win_size
        st, cloud, cmask = self._jit_kdtree_step(
            x_prop, self.init_cloud, self.init_cloud_mask, down, dmask)
        self.x = st
        self.init_cloud, self.init_cloud_mask = cloud, cmask

        i = self.win_count
        self.win = jax.tree.map(
            lambda a, b: a.at[i].set(b), self.win, st)
        self.scan_buf[i] = np.asarray(down)
        self.scan_mask[i] = np.asarray(dmask)
        self.scan_tr[i] = np.asarray(tr)
        if i > 0:
            self._preint_list.append(p_int)
            g_m, a_m, dt_m, m_m = self._last_imu_mid
            self.imu_buf_g[i] = g_m
            self.imu_buf_a[i] = a_m
            self.imu_buf_dt[i] = dt_m
            self.imu_buf_m[i] = m_m
        self.win_count += 1
        self.scan_count += 1

        if self.win_count < W:
            return {"phase": "init_accum", "win": self.win_count}

        # --- dynamic init (motion_init, two phases) ---
        # Phase 1 runs relaxed map thresholds; on the first within-round
        # convergence (|r0-r1|/r0 < converge_thre, round >= 2) gravity is
        # aligned, the production thresholds are restored and the
        # convergence gate tightens to 0.01; iteration continues to a
        # second convergence or max_rounds (reference motion_init,
        # voxelslam.cpp:619-767).
        states = self.win
        scans = jnp.array(self.scan_buf)
        masks = jnp.array(self.scan_mask)
        trs = jnp.array(self.scan_tr)
        imu_bufs = (jnp.array(self.imu_buf_g), jnp.array(self.imu_buf_a),
                    jnp.array(self.imu_buf_dt), jnp.array(self.imu_buf_m))
        ev0 = 0.0
        aligned = False
        conv_thr = cfg.init.converge_thre
        for rnd in range(cfg.init.max_rounds):
            if aligned:
                min_eig = cfg.map.min_eigen_value
                thr = cfg.map.plane_thr[0]
            else:
                min_eig = cfg.init.min_eigen_value
                thr = cfg.init.plane_thr
            states, r0, r1, ev = self._jit_init_round(
                scans, masks, trs, states, *imu_bufs,
                jnp.float32(min_eig), jnp.float32(thr))
            r0, r1 = float(r0), float(r1)
            if abs(r0 - r1) / max(r0, 1e-9) < conv_thr and rnd >= 2:
                ev0 = float(ev)
                if not aligned:
                    states = self._jit_align(states)
                    aligned = True
                    conv_thr = 0.01
                    continue
                break

        if not aligned:   # never converged: align for the gate check only
            states = self._jit_align(states)
        g_norm = float(jnp.linalg.norm(states.g[0]))
        ok = (aligned and float(ev0) >= cfg.init.degeneracy_eig
              and cfg.init.gravity_norm_lo <= g_norm
              <= cfg.init.gravity_norm_hi)
        if not ok:
            self.reset(session=self.session + 1)
            return {"phase": "init_failed", "ev0": float(ev0),
                    "g_norm": g_norm}

        # success: build the real map from the window at optimized states
        self.win = states
        self.x = states[W - 1]
        self.x = dataclasses.replace(self.x, cov=NavState.identity().cov)
        self._gravity = states.g[0]
        self.levels = vm.empty_map(cfg.map)
        for i in range(W):
            self.levels = self._jit_push(
                self.levels, states[i], jnp.array(self.scan_buf[i]),
                jnp.array(self.scan_mask[i]), jnp.array(self.scan_tr[i]),
                self.mp[i], self.jour)
        self.levels = self._refresh_now()
        # re-integrate the window preints at the optimized biases
        self._preint_list = []
        for i in range(1, W):
            self._preint_list.append(self._jit_integrate(
                jnp.array(self.imu_buf_g[i]), jnp.array(self.imu_buf_a[i]),
                jnp.array(self.imu_buf_dt[i]), jnp.array(self.imu_buf_m[i]),
                states.bg[i - 1], states.ba[i - 1]))
        self.init_done = True
        r0, r1 = self._do_ba_slide()
        # post-slide preint pairs for the fused steady path (invariant:
        # entry k <-> current pair (k, k+1); the stale tail entries are
        # overwritten by the accumulate/fill scans before any BA reads
        # them)
        plist = list(self._preint_list)
        while len(plist) < W - 1:
            plist.append(plist[-1])
        self.preints_dev = _stack(plist[:W - 1])
        return {"phase": "init_done", "g_norm": g_norm, "ev0": float(ev0),
                "ba_r0": r0, "ba_r1": r1}

    def _refresh_now(self):
        return self._jit_refresh(self.levels, self.win, self.mp,
                                 jnp.int32(self.win_count))

    # --- steady phase ----------------------------------------------------

    def _do_ba_slide(self):
        """Window BA + marginalize + slide (host wrapper; init path only —
        the steady phase uses the fused megastep)."""
        cfg = self.cfg
        W = cfg.lba.win_size
        mg = cfg.lba.mgsize
        preints = _stack(self._preint_list[-(W - 1):])
        levels, new_win, win_shift, mp_new, v6, r0, r1 = \
            self._jit_ba_slide(self.levels, self.win, preints, self.mp)
        v6 = np.asarray(v6)
        for k in range(mg):
            s = new_win[k]
            self.scan_poses.append(ScanPose(
                t=float(s.t), R=np.asarray(s.R), p=np.asarray(s.p),
                v=np.asarray(s.v), v6=v6[k],
                cloud=self.scan_buf[k].copy(),
                cloud_mask=self.scan_mask[k].copy(),
                session=self.session,
                bg=np.asarray(s.bg), ba=np.asarray(s.ba),
                g=np.asarray(s.g)))
        self.levels = levels
        self.win = win_shift
        self.mp = mp_new
        self.x = new_win[W - 1]
        self.scan_buf = np.roll(self.scan_buf, -mg, axis=0)
        self.scan_mask = np.roll(self.scan_mask, -mg, axis=0)
        self.scan_tr = np.roll(self.scan_tr, -mg, axis=0)
        self._preint_list = self._preint_list[mg:]
        self.win_count = W - mg
        return float(r0), float(r1)

    def _process_steady_fused(self, ts_j, gyr_j, acc_j, imask, t_beg,
                               t_end, last_end, pts_j, off_j, pmask):
        """Steady phase: ONE fused device call per scan.

        Packed per-scan stats accumulate in an on-device ring of
        `_ring_K` rows; the host fetches the full ring in ONE readback
        after the ring fills, and only after the NEXT scan has been
        dispatched (a blocking device->host readback costs a full
        tunnel round-trip, ~25-30 ms measured — the ring amortizes it
        and the deferral overlaps it with device execution). Pose
        emission / divergence bookkeeping therefore lag up to
        ring+1 scans; the degrade hysteresis (bound 10+) makes that
        immaterial, and `_flush_pending` forces emission wherever exact
        state is needed (flush, loop corrections). With clouds collected
        (loop closure on) the ring is 1 — clouds need per-scan fetches
        anyway."""
        cfg = self.cfg
        W = cfg.lba.win_size
        mg = cfg.lba.mgsize

        imu_np = np.concatenate(
            [ts_j[:, None], gyr_j, acc_j, imask[:, None]],
            axis=1, dtype=np.float32)
        scan_np = np.concatenate(
            [pts_j, off_j[:, None], pmask[:, None]], axis=1,
            dtype=np.float32)

        if self._batch_K > 1:
            return self._process_steady_batched(imu_np, scan_np, t_beg,
                                                t_end, last_end)

        imu_blob = jnp.array(imu_np)
        scan_blob = jnp.array(scan_np)
        scal = jnp.array([t_beg, t_end, last_end, self.jour,
                          float(self._ring_fill)], jnp.float32)

        if mg > 1:
            # the refill decision needs an up-to-date win_count
            out_pending = self._flush_pending()
            if out_pending is not None and out_pending.get("phase") == "reset":
                return out_pending
            if self.win_count < W - 1:
                return self._process_steady_accum(imu_blob, scan_blob,
                                                  scal, t_end)

        (x_out, levels, win_next, mp_new, preints, ring,
         down, dmask, tr) = self._jit_megastep(
            self.x, self.levels, self.win, self.mp, self.preints_dev,
            self._stats_ring, imu_blob, scan_blob, scal)

        self.x = x_out
        self.levels = levels
        self.win = win_next
        self.mp = mp_new
        self.preints_dev = preints
        self._stats_ring = ring
        self._ring_fill += 1
        self._pend_t.append(t_end)
        self.scan_count += 1

        out = None
        if self._pending is not None:
            out = self._emit_pending()
        if out is not None and out.get("phase") == "reset":
            # divergence reset: the in-flight scan used the diverged
            # trajectory/map — discard it with the session
            return out
        if self._ring_fill >= self._ring_K:
            self._pending = (self._stats_ring, self._ring_fill,
                             list(self._pend_t), down, dmask, tr)
            self._ring_fill = 0
            self._pend_t = []
        if out is None:
            out = {"phase": "odom", "pending": True, "t": t_end}
        return out

    def _process_steady_batched(self, imu_np, scan_np, t_beg, t_end,
                                last_end):
        """Steady phase with K-scan fused dispatch: queue the scan; on
        every `_batch_K`-th scan run ONE `_steady_megastep_k` device
        call over the whole queue. `jour` is read at dispatch time for
        all K scans (staleness < K scans of travel; it only stamps
        voxel creation distances against a ~700 m eviction horizon)."""
        self._scan_queue.append((imu_np, scan_np, t_beg, t_end, last_end))
        self._pend_t.append(t_end)
        self.scan_count += 1
        if len(self._scan_queue) < self._batch_K:
            return {"phase": "odom", "pending": True, "t": t_end}

        q, self._scan_queue = self._scan_queue, []
        t_ends, self._pend_t = self._pend_t, []
        K = len(q)
        imu_b = jnp.array(np.stack([e[0] for e in q]))
        scan_b = jnp.array(np.stack([e[1] for e in q]))
        scals = jnp.array(
            [[e[2], e[3], e[4], self.jour, float(k)]
             for k, e in enumerate(q)], jnp.float32)
        (x, levels, win, mp, preints, ring, downs, dmasks, trs) = \
            self._jit_megastep_k(self.x, self.levels, self.win, self.mp,
                                 self.preints_dev, imu_b, scan_b, scals)
        self.x = x
        self.levels = levels
        self.win = win
        self.mp = mp
        self.preints_dev = preints

        # emit the PREVIOUS batch while this one executes (deferred
        # readback overlaps device time), then rotate the pending buffer
        out = None
        if self._pending is not None:
            out = self._emit_pending()
        if out is not None and out.get("phase") == "reset":
            return out
        cc = self.collect_clouds
        self._pending = (ring, K, t_ends,
                         downs if cc else None,
                         dmasks if cc else None,
                         trs if cc else None)
        if out is None:
            out = {"phase": "odom", "pending": True, "t": t_end}
        return out

    def _drain_queue_partial(self):
        """Flush a partially filled scan queue scan-by-scan through the
        single-scan megastep (the K-batched executable is
        shape-specialized to `_batch_K`; partial drains happen only at
        corrections / finish / explicit flush, so they reuse the K=1
        compile instead of building one per partial length). Sets
        `_pending` with the drained scans' stats for emission."""
        q, self._scan_queue = self._scan_queue, []
        t_ends, self._pend_t = self._pend_t, []
        rows = []
        for (imu_np, scan_np, t_beg, t_end, last_end) in q:
            ring1 = jnp.zeros((1, self._stats_len))
            scal = jnp.array([t_beg, t_end, last_end, self.jour, 0.0],
                             jnp.float32)
            (x, levels, win, mp, preints, ring1, down, dmask, tr) = \
                self._jit_megastep(self.x, self.levels, self.win, self.mp,
                                   self.preints_dev, ring1,
                                   jnp.array(imu_np), jnp.array(scan_np),
                                   scal)
            self.x = x
            self.levels = levels
            self.win = win
            self.mp = mp
            self.preints_dev = preints
            rows.append((ring1, down, dmask, tr))
        stats = np.stack([np.asarray(r[0][0]) for r in rows])
        cc = self.collect_clouds
        self._pending = (stats, len(q), t_ends,
                         np.stack([np.asarray(r[1]) for r in rows])
                         if cc else None,
                         np.stack([np.asarray(r[2]) for r in rows])
                         if cc else None,
                         np.stack([np.asarray(r[3]) for r in rows])
                         if cc else None)

    def _process_steady_accum(self, imu_blob, scan_blob, scal, t_end):
        """Window-refill scan (lba.mgsize > 1, win_count < W-1): one
        fused accumulate call, stats fetched synchronously (no BA, no
        emission — the refill scans between BA bursts)."""
        cfg = self.cfg
        i = self.win_count
        (x_out, levels, win, preints, stats, down, dmask, tr) = \
            self._jit_mega_accum(self.x, self.levels, self.win, self.mp,
                                 self.preints_dev, imu_blob, scan_blob,
                                 scal, jnp.int32(i))
        self.x = x_out
        self.levels = levels
        self.win = win
        self.preints_dev = preints
        self.scan_count += 1
        if self.collect_clouds:
            self.scan_buf[i] = np.asarray(down)
            self.scan_mask[i] = np.asarray(dmask)
            self.scan_tr[i] = np.asarray(tr)
        self.win_count = i + 1
        st = np.asarray(stats)
        ok = bool(st[0] > 0)
        self.degrade_cnt = max(0, self.degrade_cnt - 1) if ok \
            else self.degrade_cnt + 1
        if self.degrade_cnt > cfg.odom.degrade_bound:
            self.reset(session=self.session + 1)
            return {"phase": "reset", "session": self.session}
        return {"phase": "odom", "ok": ok, "matches": int(st[1]),
                "nnt_eig0": float(st[2]), "t": t_end, "accum": True,
                "hash_dropped": int(st[3])}

    def _flush_pending(self):
        """Force emission of all deferred state: the fetched-pending
        batch (if set), any queued-but-undispatched scans, AND any
        partially filled on-device ring."""
        out = None
        if getattr(self, "_pending", None) is not None:
            out = self._emit_pending()
            if out is not None and out.get("phase") == "reset":
                return out
        if getattr(self, "_scan_queue", None):
            self._drain_queue_partial()
            out2 = self._emit_pending()
            if out2 is not None:
                out = out2
            if out is not None and out.get("phase") == "reset":
                return out
        if getattr(self, "_ring_fill", 0) > 0:
            self._pending = (self._stats_ring, self._ring_fill,
                             list(self._pend_t), None, None, None)
            self._ring_fill = 0
            self._pend_t = []
            out2 = self._emit_pending()
            out = out2 if out2 is not None else out
        return out

    def _emit_pending(self):
        """Fetch the pending stats ring (ONE device->host readback) and
        emit every deferred scan's poses + bookkeeping in order."""
        cfg = self.cfg
        W = cfg.lba.win_size
        mg = cfg.lba.mgsize
        ring, fill, t_ends, down, dmask, tr = self._pending
        self._pending = None

        rows = np.asarray(ring)  # ONE packed device->host fetch
        if down is not None:
            down = np.asarray(down)
            dmask = np.asarray(dmask)
            tr = np.asarray(tr)
        out = None
        for r in range(fill):
            st = rows[r]
            t_end = t_ends[r]
            ok = bool(st[0] > 0)
            matches, nnt_eig0, r0, r1 = st[1], st[2], st[3], st[4]
            v6_np = st[5:5 + 6 * mg].reshape(mg, 6)
            off = 5 + 6 * mg
            e_t = st[off:off + mg]
            e_R = st[off + mg:off + mg + 9 * mg].reshape(mg, 3, 3)
            e_p = st[off + 10 * mg:off + 13 * mg].reshape(mg, 3)
            e_v = st[off + 13 * mg:off + 16 * mg].reshape(mg, 3)
            e_bg = st[off + 16 * mg:off + 19 * mg].reshape(mg, 3)
            e_ba = st[off + 19 * mg:off + 22 * mg].reshape(mg, 3)
            e_g = st[off + 22 * mg:off + 25 * mg].reshape(mg, 3)
            hash_dropped = int(st[off + 25 * mg])
            self.jour += float(np.linalg.norm(e_p[-1] - self._last_p)) \
                if self._last_p is not None else 0.0
            self._last_p = e_p[-1]

            # divergence bookkeeping (reference :1893-1947)
            self.degrade_cnt = max(0, self.degrade_cnt - 1) if ok \
                else self.degrade_cnt + 1
            if self.degrade_cnt > cfg.odom.degrade_bound:
                self.reset(session=self.session + 1)
                return {"phase": "reset", "session": self.session}

            # record the new scan's cloud at logical slot W-1, emit the
            # marginalized scans, then roll the host-side cloud buffers
            # (clouds are only collected in ring-of-1 mode)
            if self.collect_clouds and down is not None:
                # batched dispatch stacks per-scan clouds (K, P, ...);
                # single-scan mode passes one scan's arrays
                self.scan_buf[W - 1] = down[r] if down.ndim == 3 else down
                self.scan_mask[W - 1] = dmask[r] if dmask.ndim == 2 else dmask
                self.scan_tr[W - 1] = tr[r] if tr.ndim == 3 else tr
            for k in range(mg):
                self.scan_poses.append(ScanPose(
                    t=float(e_t[k]), R=e_R[k], p=e_p[k], v=e_v[k],
                    v6=v6_np[k],
                    cloud=self.scan_buf[k].copy(),
                    cloud_mask=self.scan_mask[k].copy(),
                    session=self.session,
                    bg=e_bg[k], ba=e_ba[k], g=e_g[k]))
            self.scan_buf = np.roll(self.scan_buf, -mg, axis=0)
            self.scan_mask = np.roll(self.scan_mask, -mg, axis=0)
            self.scan_tr = np.roll(self.scan_tr, -mg, axis=0)
            self.win_count = W - mg

            out = {"phase": "odom", "ok": ok, "matches": int(matches),
                   "nnt_eig0": float(nnt_eig0), "t": t_end,
                   "ba_r0": float(r0), "ba_r1": float(r1),
                   "hash_dropped": hash_dropped}

        # periodic memory reclamation (reference idle-time eviction of
        # far-away octrees, voxelslam.cpp:1786-1833): rebuild any level
        # whose fixed-capacity table got too full, dropping voxels left
        # > evict_dist of travel behind
        evicted = False
        evict_dropped = 0
        # emission lands every max(ring, batch) scans: the window must
        # cover the actual emission stride or aligned hits get skipped
        # systematically when batch_scans != stats_ring
        if (cfg.map.evict_check_every > 0
                and self.scan_count % cfg.map.evict_check_every
                < max(self._ring_K, self._batch_K)):
            occ = np.asarray(self._jit_occ_counts(self.levels))
            load = occ / np.array(cfg.map.capacities, np.float64)
            if float(load.max()) > cfg.map.evict_load:
                self.levels, edrop = self._jit_evict(
                    self.levels, jnp.float32(self.jour))
                evicted = True
                evict_dropped = int(np.asarray(edrop).sum())
        if out is not None:
            out["evicted"] = evicted
            out["evict_dropped"] = evict_dropped
        return out

    def apply_correction(self, dx_R: np.ndarray, dx_p: np.ndarray,
                         g_update: bool, map_keyframes) -> None:
        """Apply a loop-closure correction between scans (reference
        loop_update, voxelslam.cpp:1255-1373): left-multiply the window
        states by dx, rebuild the live voxel map from the supplied
        keyframes (fixed points) plus the corrected window scans, and
        reset the slot indirection.

        The emitted ScanPose history is assumed already updated by the
        loop pipeline (shared objects)."""
        self._flush_pending()   # emit pre-correction state first
        cfg = self.cfg
        W = cfg.lba.win_size
        dR = jnp.array(dx_R, jnp.float32)
        dp = jnp.array(dx_p, jnp.float32)

        win = self.win
        new_g = dR @ win.g[0] if g_update else win.g[0]
        win = dataclasses.replace(
            win,
            R=dR[None] @ win.R,
            p=jnp.einsum("ij,nj->ni", dR, win.p) + dp[None],
            v=jnp.einsum("ij,nj->ni", dR, win.v),
            g=jnp.broadcast_to(new_g, win.g.shape),
        )
        self.win = win
        self.mp = jnp.arange(W, dtype=jnp.int32)
        nvalid = self.win_count

        # rebuild the live map: keyframe clouds as fixed stats, then the
        # corrected window scans into their slots
        self.levels = vm.empty_map(cfg.map)
        for kf in map_keyframes:
            wld = kf.cloud @ kf.R0.T + kf.p0
            self.levels = self._jit_push_fixed(
                self.levels, jnp.array(wld, jnp.float32),
                jnp.array(kf.mask, jnp.float32), self.jour)
        for i in range(nvalid):
            self.levels = self._jit_push(
                self.levels, win[i], jnp.array(self.scan_buf[i]),
                jnp.array(self.scan_mask[i]), jnp.array(self.scan_tr[i]),
                self.mp[i], self.jour)
        self.levels = self._jit_refresh(self.levels, win, self.mp,
                                        jnp.int32(nvalid))

        # gravity-joint relocalization: when the correction came from a
        # cross-session first contact (g_update), re-optimize the window
        # WITH the shared gravity column on the rebuilt map instead of
        # only rotating g (reference LI_BA_OptimizerGravity at
        # g_update==2, voxelslam.cpp:1956-1965)
        if g_update and self.init_done and nvalid >= 2 \
                and getattr(self, "preints_dev", None) is not None:
            # preints_dev invariant: entry k <-> current pair (k, k+1);
            # stale tail entries (>= nvalid-1) masked inside _g_reloc
            new_win, r0, r1 = self._jit_g_reloc(
                self.levels, win, self.preints_dev, self.mp,
                jnp.int32(nvalid))
            sel = jnp.arange(W) < nvalid
            win = jax.tree.map(
                lambda a, b: jnp.where(
                    sel.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                new_win, win)
            win = dataclasses.replace(
                win, g=jnp.broadcast_to(new_win.g[0], win.g.shape))
            self.win = win
            self._gravity = new_win.g[0]
            self.levels = self._jit_refresh(self.levels, win, self.mp,
                                            jnp.int32(nvalid))

        self.x = dataclasses.replace(
            win[max(nvalid - 1, 0)], cov=self.x.cov,
            t=self.x.t, bg=self.x.bg, ba=self.x.ba)
        if self._last_p is not None:
            self._last_p = np.asarray(dx_R @ self._last_p + dx_p)

    def _push_fixed(self, levels, pts_world, mask, jour):
        tr = jnp.zeros(pts_world.shape[0])
        return vm.insert_fixed(levels, self.cfg.map, pts_world, tr, mask,
                               jour)

    def _push_fixed_refresh(self, levels, pts_world, mask, jour, win, mp,
                            win_count):
        """insert_fixed + incremental plane refresh of the touched voxels
        (steady-phase keyframe reload must produce matchable planes now —
        the scan-driven refresh only covers scan-touched voxels)."""
        tr = jnp.zeros(pts_world.shape[0])
        levels, touched = vm.insert_fixed_touched(
            levels, self.cfg.map, pts_world, tr, mask, jour)
        return vm.refresh_planes(levels, self.cfg.map, win.R, win.p, mp,
                                 win_count, touched=touched)

    def insert_keyframe_fixed(self, kf) -> None:
        """Mid-term association: fold one historical keyframe cloud into
        the live map as fixed statistics (reference keyframe_loading,
        voxelslam.cpp:1379-1438), refreshing the touched planes."""
        wld = kf.cloud @ kf.R0.T + kf.p0
        self.levels = self._jit_push_fixed_refresh(
            self.levels, jnp.array(wld, jnp.float32),
            jnp.array(kf.mask, jnp.float32), self.jour,
            self.win, self.mp, jnp.int32(self.win_count))

    def flush(self):
        """Emit remaining window states as ScanPoses (end of run)."""
        self._flush_pending()
        for k in range(self.win_count):
            s = self.win[k]
            self.scan_poses.append(ScanPose(
                t=float(s.t), R=np.asarray(s.R), p=np.asarray(s.p),
                v=np.asarray(s.v), v6=np.ones(6, np.float32),
                cloud=self.scan_buf[k].copy(),
                cloud_mask=self.scan_mask[k].copy(),
                session=self.session,
                bg=np.asarray(s.bg), ba=np.asarray(s.ba),
                g=np.asarray(s.g)))
        self.win_count = 0
        return self.scan_poses
