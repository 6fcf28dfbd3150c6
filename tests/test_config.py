"""Preset parity checks vs the reference's per-sensor YAMLs
(reference config/{avia,avia_fly,hesai,mid360,ouster,velodyne}.yaml)."""

import pytest

from voxelslam_tpu.config import preset

ALL = ["avia", "mid360", "hesai", "ouster", "velodyne", "avia_fly"]


@pytest.mark.parametrize("name", ALL)
def test_preset_shapes_consistent(name):
    cfg = preset(name)
    assert cfg.map.levels == len(cfg.map.capacities)
    assert cfg.map.levels == len(cfg.map.unique_max)
    assert cfg.map.levels == len(cfg.map.plane_thr)
    assert cfg.map.levels == len(cfg.map.min_point)
    assert len(cfg.extrinsic_R) == 9
    assert len(cfg.extrinsic_t) == 3


def test_preset_reference_values():
    # spot-check numeric parity with the reference YAMLs
    avia = preset("avia")
    assert avia.odom.down_size == 0.1            # avia.yaml Odometry
    assert avia.map.voxel_size == 1.0
    assert avia.odom.degrade_bound == 10
    assert avia.loop.jud_default == 0.5
    assert avia.gba.total_max_iter == 6

    hesai = preset("hesai")
    assert hesai.lba.imu_coef == 2.5e-5          # hesai.yaml LocalBA
    assert hesai.loop.acsize == 10 and hesai.loop.mgsize == 5
    assert hesai.map.plane_thr[0] == 1.0         # thre=[1,..] -> 1/1
    assert hesai.extrinsic_R == (0, -1, 0, -1, 0, 0, 0, 0, -1)

    ouster = preset("ouster")
    assert ouster.map.max_layer == 1             # ouster.yaml LocalBA
    assert ouster.map.levels == 2
    assert ouster.odom.blind == 1.0

    fly = preset("avia_fly")
    assert fly.loop.is_high_fly
    assert fly.gba.voxel_size == 15.0            # avia_fly.yaml GBA
    assert fly.map.voxel_size == 4.0
    assert fly.odom.degrade_bound == 100
    # aerial candidate budget 20 -> 100 (reference BTC.cpp:62)
    assert fly.loop.candidate_num == 100
    assert preset("avia").loop.candidate_num == 20

    velo = preset("velodyne")
    assert velo.odom.blind == 2.8
    assert abs(velo.gba.eigen_value_thr - 1.0 / 9.0) < 1e-12


def test_full_matmul_precision_forced():
    """Importing the package must force true-f32 contractions: TPU's
    default bf16 MXU precision quantizes world coordinates (~4 cm at
    10 m) into systematic odometry drift (0.80 m vs 0.007 m ATE on the
    simulator)."""
    import jax
    import voxelslam_tpu  # noqa: F401
    assert str(jax.config.jax_default_matmul_precision) == "highest"
