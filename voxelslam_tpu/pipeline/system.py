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

import numpy as np

from ..config import SlamConfig
from .odometry import SlamPipeline
from .loop import LoopPipeline


class SlamSystem:
    def __init__(self, cfg: SlamConfig, enable_loop: bool = True):
        self.cfg = cfg
        self.odom = SlamPipeline(cfg, collect_clouds=enable_loop)
        self.loop = LoopPipeline(cfg) if enable_loop else None
        if self.loop is not None:
            self.loop.new_session()
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
        return out

    def finish(self):
        """End of run: flush the window; returns all scan poses. Run
        gba.HbaRunner over `self.loop.keyframes` for the final global
        refinement (the reference's finish-flag path)."""
        self.odom.flush()
        return self.odom.scan_poses
