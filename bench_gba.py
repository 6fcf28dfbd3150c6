"""GBA throughput + scaling benchmark (BASELINE.md metrics 2/3).

Measures the production bottom-up window BA (convergence-driven
coarse->fine schedule, gba.hba._window_step) two ways:

  * single-device: windows run one at a time (HbaRunner default path) ->
    "gba windows/s" (each window = up to total_max_iter map rebuilds +
    3-iteration LMs over win_size keyframe clouds)
  * sharded: the same windows batched through the dist_gba window fleet
    over all visible devices -> "gba scaling efficiency" =
    (t_single_per_window / t_sharded_per_window) / n_devices

Run on the default backend. Under the single tunneled TPU chip only the
first number is produced; run with

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_gba.py --cpu

for the virtual-mesh scaling harness (same code path a real multi-chip
slice runs; on virtual devices the efficiency is bounded by host cores
and documents methodology, not silicon — this host has 2 cores).

Prints one JSON line per metric.
"""

import json
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_keyframes(n, P=4096, seed=0):
    """Synthetic corridor keyframes: two walls + floor + pillars."""
    from voxelslam_tpu.pipeline.loop import Keyframe
    rng = np.random.default_rng(seed)
    n_wall = P // 3
    base = np.concatenate([
        np.stack([rng.uniform(-15, 15, n_wall), np.full(n_wall, 4.0),
                  rng.uniform(0, 3, n_wall)], -1),
        np.stack([rng.uniform(-15, 15, n_wall), np.full(n_wall, -4.0),
                  rng.uniform(0, 3, n_wall)], -1),
        np.stack([rng.uniform(-15, 15, P - 2 * n_wall),
                  rng.uniform(-4, 4, P - 2 * n_wall),
                  np.zeros(P - 2 * n_wall)], -1),
    ]).astype(np.float32)
    kfs = []
    for i in range(n):
        p0 = np.array([0.8 * i, 0.0, 1.2])
        body = (base - p0 + rng.normal(0, 0.01, base.shape)).astype(
            np.float32)
        kfs.append(Keyframe(
            kf_index=i, scan_id=i, session=0, R0=np.eye(3),
            p0=p0 + rng.normal(0, 0.03, 3), cloud=body,
            mask=np.ones(P, np.float32), jour=float(i)))
    return kfs


def main():
    import jax
    from jax.sharding import Mesh
    from voxelslam_tpu.config import SlamConfig, GBAConfig
    from voxelslam_tpu.gba import HbaRunner

    devs = jax.devices()
    D = len(devs)
    cfg = SlamConfig(gba=GBAConfig(voxel_size=3.0, win_size=10, stride=5,
                                   total_max_iter=6))
    P = 4096
    n_windows = max(2 * D, 8)
    n_kf = 5 * (n_windows - 1) + 10
    kfs = make_keyframes(n_kf, P=P)

    # ---- single-device sequential windows --------------------------------
    single = HbaRunner(cfg, kf_point_max=P, capacity=1 << 12,
                       unique_max=2048)
    windows = []
    pend = []
    for kf in kfs:
        pend.append(kf)
        if len(pend) == 10:
            windows.append(list(pend))
            pend = pend[5:]
    windows = windows[:n_windows]
    single._run_window(windows[0], 10)          # warm up compile
    t0 = time.perf_counter()
    for w in windows:
        single._run_window(w, 10)
    t_single = (time.perf_counter() - t0) / len(windows)
    print(json.dumps({
        "metric": "gba windows/s (bottom-up window BA, 10x4096 pts)",
        "value": round(1.0 / t_single, 3), "unit": "windows/s",
        "platform": devs[0].platform, "n_devices_used": 1}))

    if D > 1:
        # ---- sharded fleet over all devices ------------------------------
        mesh = Mesh(np.array(devs), ("win",))
        sharded = HbaRunner(cfg, kf_point_max=P, capacity=1 << 12,
                            unique_max=2048, mesh=mesh,
                            fleet_batch=n_windows)
        sharded._win_queue = [list(w) for w in windows]
        sharded._flush_windows()               # warm up compile
        sharded.submaps.clear()
        sharded.edges1.clear()
        t0 = time.perf_counter()
        sharded._win_queue = [list(w) for w in windows]
        sharded._flush_windows()
        t_shard = (time.perf_counter() - t0) / len(windows)
        eff = (t_single / t_shard) / D
        print(json.dumps({
            "metric": f"gba scaling efficiency ({D} devices)",
            "value": round(eff, 3), "unit": "fraction",
            "platform": devs[0].platform,
            "speedup": round(t_single / t_shard, 3),
            "windows_per_s_sharded": round(1.0 / t_shard, 3)}))


if __name__ == "__main__":
    main()
