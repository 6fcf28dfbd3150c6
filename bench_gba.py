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
import tempfile
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


def _busy_ms(trace_dir):
    """Busy-time profile from a jax.profiler trace.

    Returns (per_device, host_compute_ms):
      per_device: {"/device:TPU:n": ms} XLA-op busy per REAL device —
        the scaling-efficiency denominator that means something when
        wall clock is host-bound (VERDICT r3 weak #2). Present only on
        real accelerator platforms.
      host_compute_ms: total busy across XLA:CPU compute-thread lines
        (tf_XLAEigen/...) — informational only on the virtual mesh
        (Eigen pools spin-wait, so this is not a clean work measure)."""
    import glob
    import os
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True))
    if not xs:
        return {}, 0.0
    sp = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        sp.ParseFromString(f.read())
    per_device = {}
    host_ms = 0.0
    for pl in sp.planes:
        if pl.name.startswith("/device:"):
            for ln in pl.lines:
                if ln.name == "XLA Ops":
                    per_device[pl.name] = sum(
                        ev.duration_ps for ev in ln.events) / 1e9
        elif pl.name == "/host:CPU":
            for ln in pl.lines:
                if ln.name.startswith("tf_XLAEigen"):
                    host_ms += sum(
                        ev.duration_ps for ev in ln.events) / 1e9
    return per_device, host_ms


def main():
    import jax
    import jax.numpy as jnp
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

    # ---- single-device streaming windows ---------------------------------
    # the production path (SlamSystem streams keyframes through
    # add_keyframe): window N+1 dispatches before window N's readback,
    # so the wall clock includes BA + edge extraction + condense yet
    # approaches pure device-busy time (dispatch-ahead pipeline)
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

    def stream_all():
        single.submaps.clear()
        single.edges1.clear()
        single._pending = []
        for kf in kfs:
            single.add_keyframe(kf)
        single.flush()
        return len(single.submaps)

    n_win_run = stream_all()                    # warm up compiles
    # timed loop runs WITHOUT the profiler (trace capture through the
    # tunneled backend inflates wall clock ~4x); busy time comes from a
    # separate traced pass over the same stream
    t0 = time.perf_counter()
    n_win_run = stream_all()
    t_single = (time.perf_counter() - t0) / n_win_run
    trace_1 = tempfile.mkdtemp(prefix="gba_trace1_")
    with jax.profiler.trace(trace_1):
        stream_all()
    busy_1, host_busy_1 = _busy_ms(trace_1)
    print(json.dumps({
        "metric": "gba windows/s (bottom-up window BA, 10x4096 pts)",
        "value": round(1.0 / t_single, 3), "unit": "windows/s",
        "platform": devs[0].platform, "n_devices_used": 1,
        "n_windows": n_win_run,
        "device_busy_ms_per_window": round(
            sum(busy_1.values()) / n_win_run, 2) if busy_1 else None}))

    if D > 1:
        # ---- sharded fleet over all devices ------------------------------
        mesh = Mesh(np.array(devs), ("win",))
        sharded = HbaRunner(cfg, kf_point_max=P, capacity=1 << 12,
                            unique_max=2048, mesh=mesh,
                            fleet_batch=n_windows)
        sharded._win_queue = [list(w) for w in windows]
        sharded.flush()                        # warm up compile
        sharded.submaps.clear()
        sharded.edges1.clear()
        t0 = time.perf_counter()
        sharded._win_queue = [list(w) for w in windows]
        out = sharded.flush()
        t_flush = time.perf_counter() - t0
        t_shard = t_flush / len(windows)
        trace_d = tempfile.mkdtemp(prefix="gba_traceD_")
        sharded.submaps.clear()
        sharded.edges1.clear()
        sharded._win_queue = [list(w) for w in windows]
        with jax.profiler.trace(trace_d):
            sharded.flush()
        # host work per window: re-run the flush with the fleet call
        # replaced by its cached outputs — times ONLY the padding /
        # unpack / object-building host sections
        cached = {}
        real_fleet = sharded._get_fleet(10, 1024)

        def capture_fleet(*a):
            cached["out"] = real_fleet(*a)
            return cached["out"]
        sharded._fleet_cache[(10, 1024)] = capture_fleet
        sharded.submaps.clear()
        sharded.edges1.clear()
        sharded._win_queue = [list(w) for w in windows]
        sharded.flush()
        sharded._fleet_cache[(10, 1024)] = lambda *a: cached["out"]
        sharded.submaps.clear()
        sharded.edges1.clear()
        t0 = time.perf_counter()
        sharded._win_queue = [list(w) for w in windows]
        sharded.flush()
        host_ms = (time.perf_counter() - t0) * 1e3 / len(windows)
        eff_wall = (t_single / t_shard) / D
        busy_d, host_busy_d = _busy_ms(trace_d)
        eff_busy = None
        if busy_1 and busy_d:
            # perfect sharding: each device busy = single-run busy / D
            total_single = sum(busy_1.values())
            max_dev = max(busy_d.values())
            eff_busy = total_single / (D * max_dev) if max_dev else None
        # virtual mesh: host-thread busy time includes Eigen pool
        # spin-waits, so a work ratio is not meaningful here. What IS
        # checkable on this host: the sharded fleet compiles with ZERO
        # collectives (each device runs its equal-shaped windows
        # independently), so real-mesh scaling is bounded only by load
        # balance — which padding makes exact.
        collective_free = None
        try:
            txt = real_fleet.lower(
                jnp.zeros((len(windows) + (-len(windows)) % D, 10, P, 3),
                          jnp.float32),
                jnp.zeros((len(windows) + (-len(windows)) % D, 10, P),
                          jnp.float32),
                jnp.zeros((len(windows) + (-len(windows)) % D, 10, 3, 3),
                          jnp.float32),
                jnp.zeros((len(windows) + (-len(windows)) % D, 10, 3),
                          jnp.float32),
                jnp.zeros((len(windows) + (-len(windows)) % D, 10),
                          jnp.float32)).compile().as_text()
            collective_free = not any(
                tok in txt for tok in ("all-reduce", "all-gather",
                                       "collective-permute",
                                       "reduce-scatter", "all-to-all"))
        except Exception:
            pass
        print(json.dumps({
            "metric": f"gba scaling efficiency ({D} devices)",
            "value": (round(eff_busy, 3) if eff_busy
                      else round(eff_wall, 3)),
            "unit": ("fraction (device-busy based)" if eff_busy
                     else "fraction (wall clock; host-bound virtual "
                          "mesh — see collective_free)"),
            "platform": devs[0].platform,
            "efficiency_wallclock": round(eff_wall, 3),
            "speedup_wallclock": round(t_single / t_shard, 3),
            "windows_per_s_sharded": round(1.0 / t_shard, 3),
            "host_ms_per_window": round(host_ms, 2),
            "collective_free": collective_free,
            "device_busy_ms": {k: round(v, 1) for k, v in
                               sorted(busy_d.items())},
            "n_windows": len(windows)}))


if __name__ == "__main__":
    main()
