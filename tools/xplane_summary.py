"""Parse a jax.profiler xplane.pb trace directly (no
tensorboard_plugin_profile, which is broken against this protobuf) and
print per-executable and per-op device-time totals.

Usage: python tools/xplane_summary.py <trace_dir> [n_iters]
Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (set automatically).
"""
import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def summarize(trace_dir, n_iters=1, top=18):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                          recursive=True))
    if not xs:
        print("no xplane.pb under", trace_dir)
        return
    sp = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        sp.ParseFromString(f.read())
    for pl in sp.planes:
        if not pl.name.startswith("/device:"):
            continue
        meta = {k: v.name for k, v in pl.event_metadata.items()}
        for ln in pl.lines:
            if ln.name not in ("XLA Modules", "XLA Ops"):
                continue
            tot = defaultdict(float)
            cnt = defaultdict(int)
            busy = 0.0
            for ev in ln.events:
                nm = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[nm] += ev.duration_ps / 1e9
                cnt[nm] += 1
                busy += ev.duration_ps / 1e9
            print(f"[{pl.name}] {ln.name}: busy {busy:.2f} ms total, "
                  f"{busy/n_iters:.2f} ms/iter")
            for nm, d in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                print(f"    {d/n_iters:9.3f} ms/iter  x{cnt[nm]:6d}  "
                      f"{nm[:90]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
