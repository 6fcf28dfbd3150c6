"""BTC place-recognition precision/recall harness (VERDICT r3 #5).

No public datasets are mountable in this environment, so the structural
-corner BTC redesign (voxelslam_tpu/loop/btc.py) is validated on the
harshest synthetic setup the simulator supports: N distinct multi-
structure places (randomized room shells + pillar layouts), revisit
queries with large yaw deltas (0-180 deg), translation offsets, fresh
sensor noise, and partial overlap, plus novel-place queries that must
NOT match. Reference behavior being scored: SearchLoop candidate voting
+ geometric verification (BTC.cpp:1128-1279 voting, :1422-1479 overlap
verify) — a claimed match is a candidate whose plane-overlap score
clears the jud gate, exactly the loop pipeline's accept path.

Two profiles: ground (default) and aerial (is_high_fly: sparser, higher
viewpoints over larger scenes; candidate_num 100, BTC.cpp:62).

Prints one JSON line per profile:
  {"metric": "btc precision (ground)", ...}
  {"metric": "btc recall (ground)", ...}
"""

import json
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_place(seed, aerial=False, clutter=False):
    """clutter=True adds cylinder facets and a ramp (non-planar
    geometry, VERDICT r4 #6) to the random place."""
    from voxelslam_tpu.io import simulator as sim
    rng = np.random.default_rng(seed)
    scale = 2.0 if aerial else 1.0
    half = (rng.uniform(10, 16) * scale, rng.uniform(8, 14) * scale,
            rng.uniform(3, 4.5) * scale)
    center = (rng.uniform(-2, 6), rng.uniform(-3, 3), half[2] / 2)
    normals, ds = sim.box_room(half, center)
    if aerial:
        # open-top "terrain": ground + perimeter walls + buildings, no
        # ceiling (an aircraft looks DOWN at open structure)
        keep = [0, 1, 2, 3, 4]
        normals, ds = normals[keep], ds[keep]
    scene = sim.Scene.from_planes(normals, ds)
    n_pillars = rng.integers(5, 11)
    for _ in range(n_pillars):
        px = center[0] + rng.uniform(-half[0] + 3, half[0] - 3)
        py = center[1] + rng.uniform(-half[1] + 3, half[1] - 3)
        if abs(px - center[0]) < 4 and abs(py - center[1]) < 4:
            continue
        sx, sy = rng.uniform(0.8, 3.0, 2) * scale
        sz = rng.uniform(1.5, 2 * half[2] - 0.5)
        scene = scene + sim.box_scene((px, py, sz / 2), (sx, sy, sz))
    if clutter:
        for _ in range(rng.integers(3, 6)):
            px = center[0] + rng.uniform(-half[0] + 3, half[0] - 3)
            py = center[1] + rng.uniform(-half[1] + 3, half[1] - 3)
            if abs(px - center[0]) < 4 and abs(py - center[1]) < 4:
                continue
            r = rng.uniform(0.3, 1.0) * (2.0 if aerial else 1.0)
            h = rng.uniform(1.5, 2 * half[2] - 0.5)
            scene = scene + sim.cylinder_scene((px, py, h / 2), r, h)
        scene = scene + sim.ramp_scene(
            (center[0] + rng.uniform(-4, 4), center[1] + rng.uniform(-4, 4),
             0.0), rng.uniform(3, 6), rng.uniform(1.5, 3), rng.uniform(0.5, 1.2),
            yaw=rng.uniform(0, 2 * np.pi))
    return scene, center, half


def keyframe_cloud(scene, origin, yaw, seed, aerial=False, P=8192):
    """Merged multi-scan keyframe cloud in the body frame of
    (yaw, origin) — mirrors the pipeline's keyframe creation."""
    import jax.numpy as jnp
    from voxelslam_tpu.io import simulator as sim
    from voxelslam_tpu.ops.downsample import voxel_downsample
    rng = np.random.default_rng(seed)
    R0 = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    # aerial rays: a real Avia emits ~240k pts/s; the r4 pattern
    # (96x12 = 1.1k rays/scan from 25+ m over 100 m scenes) left ~2
    # points per building FACE — no descriptor can encode unobserved
    # structure. 224x40 is still ~25x sparser than the real sensor per
    # keyframe but gives walls the few-points-per-column the occupancy
    # code needs; P stays 8192 via the same 0.4 m downsample.
    n_az, n_el = (224, 40) if aerial else (180, 24)
    fov = (-1.35, -0.25) if aerial else (-0.4, 0.3)   # aerial looks down
    pts = []
    for _ in range(6 if aerial else 10):
        p = np.asarray(origin) + rng.normal(0, 0.3, 3) * [1, 1, 0.1]
        dirs, _ = sim.scan_directions(n_az, n_el, fov_el=fov)
        pc, hit = sim.raycast(p, R0, dirs, scene, max_range=120.0)
        w = pc[hit] @ R0.T + p
        pts.append(w + rng.normal(0, 0.015, w.shape))
    W = np.concatenate(pts)
    body = (W - np.asarray(origin)) @ R0
    down, dmask, _ = voxel_downsample(
        jnp.array(body, jnp.float32), jnp.ones(len(body), jnp.float32),
        0.4 if aerial else 0.2, P)
    return np.asarray(down), np.asarray(dmask, np.float32)


def run_profile(aerial: bool, n_places=10, n_novel=6, seed0=100,
                extractor: str = "projection", clutter: bool = False):
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import preset
    from voxelslam_tpu.loop.btc import BtcConfig, DescriptorDB, extract

    cfg = preset("avia_fly" if aerial else "avia")
    bcfg = BtcConfig.profile(aerial, extractor=extractor)
    jud = cfg.loop.jud_default
    cand_n = cfg.loop.candidate_num
    jit_extract = jax.jit(extract, static_argnums=(2,))

    db = DescriptorDB(bcfg)
    rng = np.random.default_rng(7)

    def desc_of(cloud, mask):
        d = jit_extract(jnp.array(cloud), jnp.array(mask), bcfg)
        return {k: np.asarray(v) for k, v in d.items()}

    # --- database: one keyframe per place ---
    places = []
    for i in range(n_places):
        scene, center, half = make_place(seed0 + i, aerial, clutter)
        z = 2.0 * half[2] + 12.0 if aerial else 1.2
        origin = np.array([center[0], center[1], z])
        yaw = rng.uniform(0, 2 * np.pi)
        cloud, mask = keyframe_cloud(scene, origin, yaw, seed=1000 + i,
                                     aerial=aerial)
        db.add(i, desc_of(cloud, mask))
        places.append((scene, origin, half))

    def query(desc):
        """SearchLoop accept path: voted candidates -> overlap verify ->
        first to clear jud wins. Returns matched place id or None."""
        cands = db.search(desc, skip_near=-1, current_frame=1 << 30)
        for frame_id, votes, matches in cands[:cand_n]:
            ver = db.verify(desc, frame_id, matches)
            if ver is not None and ver["overlap"] >= jud:
                return frame_id
        return None

    tp = fp = fn = tn = 0
    # --- revisit queries: same place, offset + large yaw delta ---
    for i, (scene, origin, half) in enumerate(places):
        off = rng.uniform(-1, 1, 3) * [2.5, 2.5, 0.3]
        yaw = rng.uniform(0, np.pi)          # up to 180 deg delta
        cloud, mask = keyframe_cloud(scene, origin + off, yaw,
                                     seed=2000 + i, aerial=aerial)
        got = query(desc_of(cloud, mask))
        if got == i:
            tp += 1
        elif got is None:
            fn += 1
        else:
            fp += 1
    # --- novel-place queries: must not match anything ---
    for i in range(n_novel):
        scene, center, half = make_place(seed0 + 500 + i, aerial, clutter)
        z = 2.0 * half[2] + 12.0 if aerial else 1.2
        origin = np.array([center[0], center[1], z])
        cloud, mask = keyframe_cloud(scene, origin,
                                     rng.uniform(0, 2 * np.pi),
                                     seed=3000 + i, aerial=aerial)
        got = query(desc_of(cloud, mask))
        if got is None:
            tn += 1
        else:
            fp += 1
    prec = tp / max(tp + fp, 1)
    rec = tp / max(n_places, 1)
    return dict(tp=tp, fp=fp, fn=fn, tn=tn, precision=prec, recall=rec,
                n_revisit=n_places, n_novel=n_novel)


def main():
    # the shipped extractor per profile is "projection" (the reference's
    # challenge-proven front-end, BTC.cpp:613-977); the r4 "structural"
    # alternative is scored alongside per VERDICT r4 #1 so the choice
    # stays measured, not asserted
    extractors = ["projection", "structural"]
    if "--shipped-only" in sys.argv:
        extractors = ["projection"]
    rows = [(False, "ground", False), (True, "aerial", False),
            (False, "ground, cluttered", True)]
    for aerial, name, clutter in rows:
        for ex in (extractors if not clutter else ["projection"]):
            t0 = time.time()
            r = run_profile(aerial, extractor=ex, clutter=clutter)
            tag = name if ex == "projection" else f"{name}, {ex}"
            for m in ("precision", "recall"):
                print(json.dumps({
                    "metric": f"btc {m} ({tag})",
                    "value": round(r[m], 3), "unit": "fraction",
                    "tp": r["tp"], "fp": r["fp"], "fn": r["fn"],
                    "tn": r["tn"], "n_revisit": r["n_revisit"],
                    "n_novel": r["n_novel"],
                    "wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
