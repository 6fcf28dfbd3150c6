"""voxelslam_tpu — a TPU-native LiDAR-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Voxel-SLAM system (hku-mars; reference C++ at /root/reference):

  * static & dynamic initialization with gravity alignment,
  * voxel-map iEKF odometry with divergence detection,
  * sliding-window LiDAR-inertial bundle adjustment over plane features
    (BALM2-style point-cluster eigenvalue factors),
  * multi-session loop closure (triangle descriptors + pose graph),
  * hierarchical global bundle adjustment, distributable over a TPU mesh.

Everything on the compute path is fixed-shape, batched and jit-friendly:
the adaptive voxel octree becomes a stack of fixed-capacity hashed voxel
levels holding centered point-cluster moments; per-point loops become
batched gathers/segment-sums; LM optimizers are `lax.while_loop`s over
dense windowed systems.
"""

__version__ = "0.1.0"

# Geometry pipelines need true f32 contractions: TPU's DEFAULT matmul
# precision feeds the MXU bfloat16 operands, which quantizes world
# coordinates to ~4 cm at 10 m range and turns into systematic odometry
# drift (measured 0.80 m ATE over 11.6 m on the simulator vs 0.007 m at
# full precision; ~2.7 ms/scan device cost). Users embedding this next
# to bf16-friendly workloads can override per-op or re-set the global
# after import.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
