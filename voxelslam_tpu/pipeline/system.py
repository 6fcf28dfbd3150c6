"""Full SLAM system: odometry + local BA + loop closure + sessions.

The reference runs three free-running threads communicating through
flag-guarded shared state (voxelslam.cpp:3144-3170: odometry/local
mapping on the main thread, `thd_loop_closure`, `thd_globalmapping`).
Here the same dataflow is a deterministic pipeline driven scan by scan:

  process_scan -> odometry/local-BA step (SlamPipeline)
               -> emitted ScanPoses stream into LoopPipeline.push
               -> a returned LoopCorrection is applied between scans
                  (the reference applies it at the same point: the
                  loop_detect check at voxelslam.cpp:1768)
               -> mid-term association reloads one nearby historical
                  keyframe per scan (keyframe_loading, :1379-1438)

`finish()` replaces the reference's `rosparam set finish true` runtime
flag (README recipe): it flushes the window and hands keyframes to the
hierarchical GBA (voxelslam_tpu.gba) for the final global refinement.

Divergence recovery: when the odometry pipeline resets (degeneracy
hysteresis, :1930-1947), the system opens a new session; the loop
pipeline keeps all previous sessions searchable so the new session can
relocalize into them (the reference's multi-session elastic recovery,
:2219-2269).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import SlamConfig
from .odometry import SlamPipeline
from .loop import LoopPipeline


class SlamSystem:
    def __init__(self, cfg: SlamConfig, enable_loop: bool = True,
                 enable_gba: bool = False,
                 previous_maps: list[str] | None = None,
                 savepath: str | None = None):
        """previous_maps: prior session names under `savepath` to load
        and relocalize against (the reference's General/previous_map
        param, voxelslam.cpp:282-308)."""
        self.cfg = cfg
        self.savepath = savepath
        self.odom = SlamPipeline(cfg, collect_clouds=enable_loop)
        self.loop = LoopPipeline(cfg) if enable_loop else None
        self.session_names: list[str] = []
        if self.loop is not None:
            if previous_maps:
                from ..io import sessions as ses
                ses.load_previous_sessions(self.loop, savepath,
                                           previous_maps)
                self.session_names.extend(previous_maps)
            self.loop.new_session()
        self.session_names.append(f"live{len(self.session_names)}")
        self.gba = None
        if enable_gba and enable_loop:
            from ..gba.hba import HbaRunner
            from ..parallel.multihost import ensure_distributed, \
                global_win_mesh
            # multi-host slice and/or multi-device host: shard bottom-up
            # GBA windows over the global mesh (production distributed
            # path); single chip: inline
            ensure_distributed()
            self.gba = HbaRunner(cfg, mesh=global_win_mesh())
        self._gba_consumed: dict[int, int] = {}
        self._emitted = 0
        self._session = 0
        self.corrections = 0

    @property
    def scan_poses(self):
        return self.odom.scan_poses

    def process_scan(self, points, offsets, imu_ts, imu_gyr, imu_acc,
                     t_beg, t_end) -> dict:
        out = self.odom.process_scan(points, offsets, imu_ts, imu_gyr,
                                     imu_acc, t_beg, t_end)
        if self.loop is None:
            return out

        if self.odom.session != self._session:
            # odometry reset -> new session; previous sessions stay
            # searchable in the loop pipeline
            self._session = self.odom.session
            self.loop.new_session()
            self.session_names.append(f"live{len(self.session_names)}")

        # stream newly emitted scan poses into the loop pipeline
        corr = None
        while self._emitted < len(self.odom.scan_poses):
            sp = self.odom.scan_poses[self._emitted]
            self._emitted += 1
            c = self.loop.push(sp)
            if c is not None:
                corr = c
        if corr is not None:
            self.odom.apply_correction(corr.dx_R, corr.dx_p,
                                       corr.g_update, corr.map_keyframes)
            self.corrections += 1
            out = dict(out, loop_correction=True)

        # mid-term association: one nearby historical keyframe per scan
        if out.get("phase") == "odom":
            kf = self.loop.nearby_keyframe(np.asarray(self.odom.x.p))
            if kf is not None:
                self.odom.insert_keyframe_fixed(kf)

        # stream freshly created keyframes into the continuous bottom-up
        # GBA (the reference's thd_globalmapping consumption, :3066-3096)
        if self.gba is not None:
            self._drain_keyframes_to_gba()
        return out

    def _drain_keyframes_to_gba(self):
        sid = self.loop.cur_session
        done = self._gba_consumed.get(sid, 0)
        kfs = self.loop.keyframes[sid]
        while done < len(kfs):
            self.gba.add_keyframe(kfs[done])
            done += 1
        self._gba_consumed[sid] = done

    def finish(self, run_gba: bool | None = None):
        """End of run (replaces `rosparam set finish true`): flush the
        window, then — when GBA is enabled — run the final global
        refinement: total BA over all submaps + top-down pose-graph
        solve writing every session back (reference topDownProcess,
        voxelslam.cpp:2687-2812). Returns all scan poses."""
        self.odom.flush()
        if self.loop is not None:
            while self._emitted < len(self.odom.scan_poses):
                sp = self.odom.scan_poses[self._emitted]
                self._emitted += 1
                self.loop.push(sp)
        if self.gba is not None and (run_gba is None or run_gba):
            self._drain_keyframes_to_gba()
            self.gba.flush()     # sharded path: run any queued windows
            self.gba.total_ba()
            if self.gba.edges1 or self.gba.edges2:
                self.gba.top_down(self.loop)
        return self.odom.scan_poses


    def save_checkpoint(self, path: str):
        """Mid-run snapshot of ALL live state (odometry + loop + GBA);
        the reference has no equivalent (SURVEY.md 5.4) — sessions only
        persist at finish. Restore with `load_checkpoint` on a freshly
        constructed system with the same config/flags."""
        from ..utils import checkpoint as ckpt
        ckpt.save_system(self, path)

    def load_checkpoint(self, path: str):
        from ..utils import checkpoint as ckpt
        ckpt.load_system(self, path)

    def save(self, name: str | None = None):
        """Persist the live session + multi-session loop edges under
        `savepath` (reference save_pose + pgo_edges_io write,
        voxelslam.cpp:2693-2699)."""
        assert self.savepath is not None, "savepath not set"
        from ..io import sessions as ses
        if name is not None:
            self.session_names[-1] = name
        sid = self.loop.cur_session if self.loop is not None else 0
        sps = (self.loop.scan_poses[sid] if self.loop is not None
               else self.odom.scan_poses)
        ses.save_session(os.path.join(self.savepath,
                                      self.session_names[-1]), sps)
        if self.loop is not None:
            ses.write_edges(
                os.path.join(self.savepath, "edge.txt"),
                self.loop.lp_edges, self.session_names,
                extra_lines=getattr(self.loop, "_edge_absent_lines", ()))
