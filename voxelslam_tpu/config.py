"""Typed configuration tree.

Mirrors the reference's five rosparam namespaces (General / Odometry /
LocalBA / Loop / GBA, read at voxelslam.cpp:875-928, 2171-2178, 3020-3026
in the reference tree) as frozen dataclasses, plus TPU-specific static
capacities (table sizes, pad sizes) that fix all array shapes for jit.

Sensor presets mirroring config/{avia,avia_fly,hesai,ouster,velodyne,
mid360}.yaml are provided by `preset()`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MapConfig:
    voxel_size: float = 1.0
    max_layer: int = 2                      # levels = max_layer + 1
    capacities: Tuple[int, ...] = (1 << 15, 1 << 16, 1 << 17)
    win_size: int = 10
    min_point: Tuple[int, ...] = (5, 5, 5)  # per layer (voxelslam.cpp:917)
    min_eigen_value: float = 0.0025         # Odometry/LocalBA plane gate
    plane_thr: Tuple[float, ...] = (0.25, 0.25, 0.25)  # lam0/lam2 per layer
    max_points: int = 100                   # fixed-point cap per voxel
    min_ba_point: int = 20
    unique_max: Tuple[int, ...] = (4096, 8192, 16384)  # per-level cap on unique voxels touched per scan
    eig_ratio_ba: float = 0.12              # tras_opt gate (voxel_map.hpp:1615)
    evict_dist: float = 700.0               # jour-distance eviction (voxelslam.cpp:1806)
    evict_check_every: int = 100            # scans between load-factor checks
    evict_load: float = 0.4                 # table load factor triggering eviction

    @property
    def levels(self) -> int:
        return self.max_layer + 1

    def level_size(self, l: int) -> float:
        return self.voxel_size / (2.0 ** l)


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    max_iter: int = 4
    point_max: int = 8192                  # padded points per scan
    imu_max: int = 64                      # padded IMU samples per scan
    down_size: float = 0.5                 # odometry voxel downsample
    dept_err: float = 0.02                 # range sigma (m)
    beam_err: float = 0.05                 # bearing sigma (rad-ish)
    cov_gyr: float = 0.1
    cov_acc: float = 0.1
    cov_bias_gyr: float = 1e-4
    cov_bias_acc: float = 1e-4
    degrade_eig: float = 14.0              # normal-Gram gate (voxelslam.cpp:1094)
    degrade_bound: int = 10
    blind: float = 0.5                     # min range
    point_filter_num: int = 1
    point_notime: bool = False


@dataclasses.dataclass(frozen=True)
class LocalBAConfig:
    win_size: int = 10
    mgsize: int = 1                        # frames marginalized per slide
    max_iter: int = 3
    imu_coef: float = 1e-4                 # voxel_map.hpp:500
    noise_gyr: float = 0.1                 # preintegration measurement noise
    noise_acc: float = 0.1
    walk_gyr: float = 1e-4
    walk_acc: float = 1e-4
    factor_max: int = 4096                 # harvested plane factors cap


@dataclasses.dataclass(frozen=True)
class InitConfig:
    min_imu_num: int = 30
    max_rounds: int = 10
    min_eigen_value: float = 0.02          # relaxed init map (voxelslam.cpp:628)
    plane_thr: float = 0.25
    converge_thre: float = 0.05
    gravity_prior_weight: float = 10.0   # soft |g|=9.81 prior in init BA
    degeneracy_eig: float = 15.0           # voxelslam.cpp:746
    gravity_norm_lo: float = 9.6           # voxelslam.cpp:766
    gravity_norm_hi: float = 10.0


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    jud_default: float = 0.4
    icp_eigval: float = 14.0
    ratio_drift: float = 0.05
    curr_halt: int = 10
    prev_halt: int = 20
    acsize: int = 2
    mgsize: int = 1
    is_high_fly: bool = False
    descriptor_near_num: int = 20
    candidate_num: int = 50


@dataclasses.dataclass(frozen=True)
class GBAConfig:
    voxel_size: float = 4.0
    min_eigen_value: float = 0.02
    eigen_value_thr: float = 0.25
    total_max_iter: int = 10
    win_size: int = 10
    stride: int = 5
    thread_equiv: int = 5                  # reference thread pool width


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    map: MapConfig = MapConfig()
    odom: OdometryConfig = OdometryConfig()
    lba: LocalBAConfig = LocalBAConfig()
    init: InitConfig = InitConfig()
    loop: LoopConfig = LoopConfig()
    gba: GBAConfig = GBAConfig()
    lidar_type: str = "livox"
    extrinsic_R: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)
    extrinsic_t: Tuple[float, ...] = (0.0, 0.0, 0.0)


_PRESETS = {
    # Values follow the reference's per-sensor YAMLs in spirit; exact
    # numeric parity is refined as configs are exercised.
    "avia": SlamConfig(),
    "mid360": SlamConfig(map=MapConfig(voxel_size=0.5)),
    "hesai": SlamConfig(map=MapConfig(voxel_size=1.0)),
    "ouster": SlamConfig(map=MapConfig(voxel_size=1.0)),
    "velodyne": SlamConfig(map=MapConfig(voxel_size=1.0)),
    # MARS aerial: big voxels, high-fly loop profile (config/avia_fly.yaml)
    "avia_fly": SlamConfig(
        map=MapConfig(voxel_size=4.0),
        gba=GBAConfig(voxel_size=15.0),
        loop=LoopConfig(is_high_fly=True),
    ),
}


def preset(name: str) -> SlamConfig:
    return _PRESETS[name]


def small_test_config() -> SlamConfig:
    """Tiny capacities for CPU unit tests."""
    return SlamConfig(
        map=MapConfig(capacities=(1 << 12, 1 << 12, 1 << 13),
                      unique_max=(2048, 2048, 4096)),
        odom=OdometryConfig(point_max=1024, imu_max=48),
        lba=LocalBAConfig(factor_max=512),
    )
