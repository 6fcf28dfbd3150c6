import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voxelslam_tpu.config import small_test_config
from voxelslam_tpu.ops import voxel_hash as vh
from voxelslam_tpu.map import voxel_map as vm
from voxelslam_tpu.core import so3


class TestVoxelHash:
    def test_insert_lookup_roundtrip(self, rng):
        keys = rng.integers(-50, 50, size=(300, 3)).astype(np.int32)
        keys = np.unique(keys, axis=0)
        tk, occ = vh.empty_table(1 << 11)
        tk, occ, slots = vh.insert(tk, occ, jnp.array(keys),
                                   jnp.ones(len(keys), bool))
        s = np.asarray(slots)
        assert np.all(s >= 0)
        assert len(np.unique(s)) == len(keys)  # no slot collisions
        found = vh.lookup(tk, occ, jnp.array(keys), jnp.ones(len(keys), bool))
        np.testing.assert_array_equal(np.asarray(found), s)
        # absent keys -> -1
        absent = keys + 1000
        miss = vh.lookup(tk, occ, jnp.array(absent), jnp.ones(len(keys), bool))
        assert np.all(np.asarray(miss) == -1)

    def test_reinsert_existing(self, rng):
        keys = rng.integers(-20, 20, size=(100, 3)).astype(np.int32)
        keys = np.unique(keys, axis=0)
        tk, occ = vh.empty_table(1 << 10)
        tk, occ, s1 = vh.insert(tk, occ, jnp.array(keys), jnp.ones(len(keys), bool))
        tk2, occ2, s2 = vh.insert(tk, occ, jnp.array(keys), jnp.ones(len(keys), bool))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ2))

    def test_dedup(self, rng):
        base = rng.integers(-5, 5, size=(40, 3)).astype(np.int32)
        idx = rng.integers(0, 40, size=500)
        keys = base[idx]
        valid = rng.random(500) > 0.1
        uniq, uvalid, inv = vh.dedup_keys(jnp.array(keys), jnp.array(valid), 128)
        uniq, uvalid, inv = map(np.asarray, (uniq, uvalid, inv))
        n_expected = len(np.unique(keys[valid], axis=0))
        assert uvalid.sum() == n_expected
        # every valid input maps to a unique row holding its key
        for i in np.where(valid)[0][:50]:
            assert inv[i] >= 0
            np.testing.assert_array_equal(uniq[inv[i]], keys[i])
        assert np.all(inv[~valid] == -1)

    def test_voxel_key_negative_floor(self):
        pts = jnp.array([[-0.1, 0.1, -1.0], [0.9, -0.9, 2.0]])
        k = np.asarray(vh.voxel_key(pts, 1.0))
        np.testing.assert_array_equal(k, [[-1, 0, -1], [0, -1, 2]])


def _identity_window(W):
    Rs = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
    ps = jnp.zeros((W, 3))
    mp = jnp.arange(W, dtype=jnp.int32)
    return Rs, ps, mp


class TestVoxelMap:
    def _plane_points(self, rng, n=900, extent=3.0, z=0.5, noise=0.005):
        pts = np.stack([
            rng.uniform(-extent, extent, n),
            rng.uniform(-extent, extent, n),
            rng.normal(z, noise, n),
        ], -1).astype(np.float32)
        return pts

    def test_insert_and_plane_detect(self, rng):
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        pts = self._plane_points(rng)
        mask = jnp.ones(len(pts))
        tr = jnp.full((len(pts),), 1e-4)
        levels = vm.insert_scan(levels, cfg, jnp.array(pts), jnp.array(pts),
                                tr, mask, 0)
        Rs, ps, mp = _identity_window(cfg.win_size)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 1)
        st0 = np.asarray(levels[0].state)
        occ0 = np.asarray(levels[0].occ)
        assert occ0.sum() > 0
        # z=0 plane voxels at level 0 should be planes
        planes = (st0 == vm.STATE_PLANE).sum()
        assert planes >= occ0.sum() * 0.8, (planes, occ0.sum())
        # normals should be +-z
        nrm = np.asarray(levels[0].normal)[st0 == vm.STATE_PLANE]
        assert np.all(np.abs(nrm[:, 2]) > 0.99)

    def test_match_on_plane(self, rng):
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        pts = self._plane_points(rng)
        levels = vm.insert_scan(levels, cfg, jnp.array(pts), jnp.array(pts),
                                jnp.full((len(pts),), 1e-4), jnp.ones(len(pts)), 0)
        Rs, ps, mp = _identity_window(cfg.win_size)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 1)

        q = self._plane_points(rng, n=200, noise=0.001)
        var_w = jnp.tile(jnp.eye(3)[None] * 1e-4, (len(q), 1, 1))
        m = vm.match_points(levels, cfg, jnp.array(q), var_w, jnp.ones(len(q)))
        valid = np.asarray(m["valid"])
        assert valid.mean() > 0.7, valid.mean()
        # matched planes: distance should be small, normals +-z
        nrm = np.asarray(m["normal"])[valid]
        assert np.all(np.abs(nrm[:, 2]) > 0.99)
        assert np.abs(np.asarray(m["dist"])[valid]).max() < 0.05
        # off-plane points must NOT match
        q2 = q.copy()
        q2[:, 2] += 1000.0
        m2 = vm.match_points(levels, cfg, jnp.array(q2), var_w, jnp.ones(len(q)))
        assert np.asarray(m2["valid"]).sum() == 0

    def test_subdivision_descends(self, rng):
        # a corner (two perpendicular planes in one voxel) should subdivide
        # at level 0 and produce planes at finer levels
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        n = 500
        # two planes meeting at x=0: z=0 (y-x plane) and x=0 (z-y plane)
        p1 = np.stack([rng.uniform(0, 1, n), rng.uniform(0, 1, n),
                       rng.normal(0, 0.003, n)], -1)
        p2 = np.stack([rng.normal(0, 0.003, n), rng.uniform(0, 1, n),
                       rng.uniform(0, 1, n)], -1)
        pts = np.concatenate([p1, p2]).astype(np.float32)
        levels = vm.insert_scan(levels, cfg, jnp.array(pts), jnp.array(pts),
                                jnp.full((len(pts),), 1e-5), jnp.ones(len(pts)), 0)
        Rs, ps, mp = _identity_window(cfg.win_size)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 1)
        # the voxel at (0,0,0) contains both planes -> not a plane at L0
        k0 = vh.lookup(levels[0].keys, levels[0].occ,
                       jnp.array([[0, 0, 0]], jnp.int32), jnp.array([True]))
        s0 = int(np.asarray(levels[0].state)[int(k0[0])])
        assert s0 == vm.STATE_SUBDIV
        # and finer levels should contain planes
        st1 = np.asarray(levels[1].state)
        assert (st1 == vm.STATE_PLANE).sum() > 0
        # matching a point on the z=0 plane inside that voxel should succeed
        q = jnp.array([[0.6, 0.4, 0.0]], jnp.float32)
        var_w = jnp.tile(jnp.eye(3)[None] * 1e-5, (1, 1, 1))
        m = vm.match_points(levels, cfg, q, var_w, jnp.ones(1))
        assert bool(m["valid"][0])
        assert abs(float(m["normal"][0, 2])) > 0.95

    def test_transform_consistency(self, rng):
        # inserting local points under pose T then refreshing with window
        # pose T must equal inserting world points with identity pose
        cfg = small_test_config().map
        w = jnp.array([0.2, -0.4, 0.9])
        R = so3.exp(w)
        t = jnp.array([10.0, -5.0, 2.0])
        pts_l = self._plane_points(rng, n=400, extent=3.0)
        pts_w = np.asarray(pts_l @ np.asarray(R).T + np.asarray(t))

        lv_a = vm.empty_map(cfg)
        lv_a = vm.insert_scan(lv_a, cfg, jnp.array(pts_w), jnp.array(pts_l),
                              jnp.full((len(pts_l),), 1e-4), jnp.ones(len(pts_l)), 0)
        Rs = jnp.tile(R[None], (cfg.win_size, 1, 1))
        ps = jnp.tile(t[None], (cfg.win_size, 1))
        mp = jnp.arange(cfg.win_size, dtype=jnp.int32)
        lv_a = vm.refresh_planes(lv_a, cfg, Rs, ps, mp, 1)

        lv_b = vm.empty_map(cfg)
        lv_b = vm.insert_scan(lv_b, cfg, jnp.array(pts_w), jnp.array(pts_w),
                              jnp.full((len(pts_w),), 1e-4), jnp.ones(len(pts_w)), 0)
        Rs_i, ps_i, mp_i = _identity_window(cfg.win_size)
        lv_b = vm.refresh_planes(lv_b, cfg, Rs_i, ps_i, mp_i, 1)

        # same occupied slots (same world keys), same plane params
        np.testing.assert_array_equal(np.asarray(lv_a[0].occ), np.asarray(lv_b[0].occ))
        occ = np.asarray(lv_a[0].occ)
        np.testing.assert_allclose(np.asarray(lv_a[0].center)[occ],
                                   np.asarray(lv_b[0].center)[occ], atol=1e-4)
        np.testing.assert_allclose(np.asarray(lv_a[0].lam)[occ],
                                   np.asarray(lv_b[0].lam)[occ], atol=1e-5)

    def test_marginalize_preserves_planes(self, rng):
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        Rs, ps, mp = _identity_window(cfg.win_size)
        # insert the same plane into slots 0 and 1
        for f in range(2):
            pts = self._plane_points(rng, n=300)
            levels = vm.insert_scan(levels, cfg, jnp.array(pts), jnp.array(pts),
                                    jnp.full((len(pts),), 1e-4),
                                    jnp.ones(len(pts)), f)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 2)
        lam_before = np.asarray(levels[0].lam)
        st_before = np.asarray(levels[0].state)

        levels = vm.marginalize(levels, cfg, Rs, ps, mp, 2, 1)
        # window slot 0 cleared
        assert float(jnp.sum(levels[0].win.n[0])) == 0.0
        # fixed stats got the points
        assert float(jnp.sum(levels[0].fix.n)) > 0
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 2)
        st_after = np.asarray(levels[0].state)
        lam_after = np.asarray(levels[0].lam)
        occ = np.asarray(levels[0].occ)
        np.testing.assert_array_equal(st_before[occ], st_after[occ])
        np.testing.assert_allclose(lam_before[occ], lam_after[occ],
                                   atol=1e-5, rtol=1e-3)


class TestEviction:
    def _plane_points(self, rng, n=600, extent=3.0, z=0.5, noise=0.005,
                      cx=0.0):
        pts = np.stack([
            rng.uniform(-extent, extent, n) + cx,
            rng.uniform(-extent, extent, n),
            rng.normal(z, noise, n),
        ], -1).astype(np.float32)
        return jnp.array(pts)

    def test_evict_drops_far_keeps_near(self, rng):
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        Rs, ps, mp = _identity_window(cfg.win_size)

        far = self._plane_points(rng, cx=0.0)
        near = self._plane_points(rng, cx=30.0)
        tr = jnp.full((far.shape[0],), 1e-4)
        m = jnp.ones(far.shape[0])
        # far voxels created at jour=0, near at jour=750
        levels = vm.insert_scan(levels, cfg, far, far, tr, m, 0, jour=0.0)
        levels = vm.insert_scan(levels, cfg, near, near, tr, m, 1, jour=750.0)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 2)

        ev, dropped = vm.evict(levels, jour_now=800.0, max_dist=700.0)
        assert np.all(np.asarray(dropped) == 0)

        far_keys = vh.voxel_key(far, cfg.level_size(0))
        near_keys = vh.voxel_key(near, cfg.level_size(0))
        miss = vh.lookup(ev[0].keys, ev[0].occ, far_keys, m > 0)
        assert np.all(np.asarray(miss) == -1)
        hit = vh.lookup(ev[0].keys, ev[0].occ, near_keys, m > 0)
        assert np.all(np.asarray(hit) >= 0)

        # surviving voxels carry their data to the new slots: match still
        # associates near points with the z=0.5 plane
        var_w = jnp.tile((jnp.eye(3) * 1e-4)[None], (near.shape[0], 1, 1))
        res = vm.match_points(ev, cfg, near, var_w, m)
        frac = float(jnp.sum(res["valid"])) / near.shape[0]
        assert frac > 0.8
        nrm = np.asarray(res["normal"])[np.asarray(res["valid"])]
        assert np.all(np.abs(nrm[:, 2]) > 0.95)

    def test_evict_preserves_window_and_fix(self, rng):
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        Rs, ps, mp = _identity_window(cfg.win_size)
        pts = self._plane_points(rng, cx=5.0)
        tr = jnp.full((pts.shape[0],), 1e-4)
        m = jnp.ones(pts.shape[0])
        levels = vm.insert_scan(levels, cfg, pts, pts, tr, m, 0, jour=100.0)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 1)
        n_before = float(jnp.sum(levels[0].win.n))
        ev, _ = vm.evict(levels, jour_now=150.0, max_dist=700.0)
        assert float(jnp.sum(ev[0].win.n)) == n_before
        assert float(jnp.sum(ev[0].occ)) == float(jnp.sum(levels[0].occ))


def test_insert_reports_dropped_keys():
    """insert_scan_level surfaces the count of keys whose probe chain
    exhausted PROBES (load-factor pathology observability)."""
    import numpy as np
    import jax.numpy as jnp
    from voxelslam_tpu.map import voxel_map as vm2

    lv = vm.empty_level(capacity=16, win_size=2)
    rng = np.random.default_rng(3)
    # far more unique voxels than a 16-slot table can hold
    pts = rng.uniform(-50, 50, (256, 3)).astype(np.float32)
    tr = jnp.zeros(256)
    m = jnp.ones(256)
    lv2, s, sv, dropped = vm2.insert_scan_level(
        lv, 1.0, 256, jnp.array(pts), jnp.array(pts), tr, m, 0, 0.0)
    assert int(dropped) > 0
    # stored + dropped accounts for every unique key that was attempted
    assert int(jnp.sum(sv)) + int(dropped) > 16


class TestAnisotropicNoise:
    """Plane-gate noise uses the variance ALONG THE NORMAL from the
    rank-1 + isotropic per-voxel accumulator (reference Bf_var /
    plane_update propagate full per-point covariances,
    voxel_map.hpp:106-121,1344-1388; see voxel_map module docstring for
    the compression)."""

    def _insert_plane(self, rng, dirs_along_normal: bool):
        import dataclasses as dc
        cfg = small_test_config().map
        dept, beam, dist = 0.01, 0.05, 10.0   # beam*d = 0.5 >> dept
        levels = vm.empty_map(cfg)
        Rs, ps, mp = _identity_window(cfg.win_size)
        n = 400
        pts = np.stack([rng.uniform(0, 0.9, n), rng.uniform(0, 0.9, n),
                        rng.normal(0.5, 0.001, n)], -1).astype(np.float32)
        pts = jnp.array(pts)
        m = jnp.ones(n)
        if dirs_along_normal:
            # sensor far BELOW the plane: rays along +z (the normal)
            body = pts + jnp.array([0.0, 0.0, dist])
        else:
            # sensor far to the SIDE: rays along +x (in-plane)
            body = pts + jnp.array([dist, 0.0, 0.0])
        nv = vm.point_noise_record(body, dept, beam)
        levels = vm.insert_scan(levels, cfg, pts, pts, nv, m, 0)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 1)
        lv = levels[0]
        sl = np.asarray(lv.slab)
        st = np.asarray(lv.state)
        rows = np.where(st == vm.STATE_PLANE)[0]
        assert len(rows) > 0
        return sl[rows[0]]

    def test_normal_direction_noise_drives_gate(self, rng):
        slab_n = self._insert_plane(rng, dirs_along_normal=True)
        slab_t = self._insert_plane(rng, dirs_along_normal=False)
        cvar_n = slab_n[8]   # _S_CVAR: center variance along normal / N
        cvar_t = slab_t[8]
        # rays along the normal put the large beam error IN-plane ->
        # tiny along-normal variance (~dept^2); rays in-plane put it
        # along the normal -> large variance (~(beam*d)^2)
        assert cvar_t > 20.0 * cvar_n, (cvar_n, cvar_t)

    def test_scalar_tr_backcompat(self, rng):
        """(P,) per-point trace still accepted (isotropic expansion)."""
        cfg = small_test_config().map
        levels = vm.empty_map(cfg)
        Rs, ps, mp = _identity_window(cfg.win_size)
        n = 300
        pts = np.stack([rng.uniform(0, 0.9, n), rng.uniform(0, 0.9, n),
                        rng.normal(0.5, 0.001, n)], -1).astype(np.float32)
        tr = jnp.full((n,), 1e-4)
        levels = vm.insert_scan(levels, cfg, jnp.array(pts),
                                jnp.array(pts), tr, jnp.ones(n), 0)
        levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 1)
        st = np.asarray(levels[0].state)
        assert np.sum(st == vm.STATE_PLANE) > 0
        sl = np.asarray(levels[0].slab)
        rows = np.where(st == vm.STATE_PLANE)[0]
        n_vox = np.asarray(levels[0].win.n[0])[rows[0]]
        # isotropic: sigma^2 = tr, cvar = tr / n
        np.testing.assert_allclose(sl[rows[0], 8], 1e-4 / n_vox,
                                   rtol=1e-3)


class TestFusedInsert:
    """insert_scan_fused (packed 16-channel moment accumulation,
    voxel-center-relative coordinates) must reproduce the scatter-based
    insert_scan_touched, on both the XLA fallback and the Pallas kernel
    (interpret mode)."""

    def _data(self, rng, n=600):
        cfg = small_test_config().map
        from voxelslam_tpu.core import so3
        R = np.asarray(so3.exp(jnp.array([0.1, -0.2, 0.3], jnp.float32)))
        p = np.array([1.5, -0.7, 0.4], np.float32)
        loc = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
        wld = loc @ R.T + p
        mask = (rng.random(n) > 0.1).astype(np.float32)
        tr = np.full((n,), 1e-4, np.float32)
        return cfg, R, p, loc, wld, mask, tr

    @pytest.mark.parametrize("interpret", [False, True])
    def test_matches_scatter_insert(self, rng, interpret):
        cfg, R, p, loc, wld, mask, tr = self._data(rng)
        levels_a = vm.empty_map(cfg)
        levels_b = vm.empty_map(cfg)
        a, ta = vm.insert_scan_touched(levels_a, cfg, jnp.array(wld),
                                       jnp.array(loc), jnp.array(tr),
                                       jnp.array(mask), 0, 2.0)
        b, tb = vm.insert_scan_fused(levels_b, cfg, jnp.array(wld),
                                     jnp.array(loc), jnp.array(tr),
                                     jnp.array(mask), 0, 2.0,
                                     jnp.array(R), jnp.array(p),
                                     interpret=interpret)
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la.keys),
                                          np.asarray(lb.keys))
            np.testing.assert_allclose(np.asarray(la.win.n[0]),
                                       np.asarray(lb.win.n[0]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(la.win.mu[0]),
                                       np.asarray(lb.win.mu[0]), atol=2e-4)
            np.testing.assert_allclose(np.asarray(la.win.S[0]),
                                       np.asarray(lb.win.S[0]), atol=2e-3)
            np.testing.assert_allclose(np.asarray(la.win_nv[0]),
                                       np.asarray(lb.win_nv[0]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(la.jour),
                                       np.asarray(lb.jour), atol=0)
        for (sa, va, da), (sb, vb, db) in zip(ta, tb):
            np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
            assert int(da) == int(db)

    def test_merge_into_existing_column(self, rng):
        """Second scan into the same window slot merges (not replaces)."""
        cfg, R, p, loc, wld, mask, tr = self._data(rng)
        levels = vm.empty_map(cfg)
        levels, _ = vm.insert_scan_fused(levels, cfg, jnp.array(wld),
                                         jnp.array(loc), jnp.array(tr),
                                         jnp.array(mask), 0, 0.0,
                                         jnp.array(R), jnp.array(p))
        n1 = float(jnp.sum(levels[0].win.n[0]))
        levels, _ = vm.insert_scan_fused(levels, cfg, jnp.array(wld),
                                         jnp.array(loc), jnp.array(tr),
                                         jnp.array(mask), 0, 0.0,
                                         jnp.array(R), jnp.array(p))
        n2 = float(jnp.sum(levels[0].win.n[0]))
        assert abs(n2 - 2 * n1) < 1e-3


class TestSparseMarginalize:
    """The touched-slot sparse fold (tsl width > 0) must produce exactly
    the same fixed statistics as the full-table fold (tsl width 0) —
    same inserts, same poses, same max_points cap behavior."""

    def _build(self, rng, track: bool):
        cfg = small_test_config().map
        W = cfg.win_size
        lvs = []
        for l, c in enumerate(cfg.capacities):
            t = cfg.unique_max[l] if track else 0
            lvs.append(vm.empty_level(c, W, t))
        levels = tuple(lvs)
        Rs, ps, mp = _identity_window(W)
        Rs = jnp.array(np.stack([
            np.asarray(so3.exp(jnp.array(rng.normal(0, 0.1, 3),
                                         jnp.float32)))
            for _ in range(W)]))
        ps = jnp.array(rng.normal(0, 0.5, (W, 3)).astype(np.float32))
        for i in range(3):   # three scans into slots 0..2
            pts = rng.uniform(-4, 4, (500, 3)).astype(np.float32)
            wld = pts @ np.asarray(Rs[i]).T + np.asarray(ps[i])
            levels = vm.insert_scan(levels, cfg, jnp.array(wld),
                                    jnp.array(pts),
                                    jnp.full((500,), 1e-4),
                                    jnp.ones(500), i, jour=float(i))
        return cfg, levels, Rs, ps, mp

    def test_sparse_fold_matches_full(self, rng):
        # build both from the SAME rng stream for identical data
        cfg, lv_t, Rs, ps, mp = self._build(np.random.default_rng(7),
                                            track=True)
        _, lv_f, _, _, _ = self._build(np.random.default_rng(7),
                                       track=False)

        out_t = vm.marginalize(lv_t, cfg, Rs, ps, mp, 3, 2)
        out_f = vm.marginalize(lv_f, cfg, Rs, ps, mp, 3, 2)
        for a, b in zip(out_t, out_f):
            np.testing.assert_allclose(np.asarray(a.fix.n),
                                       np.asarray(b.fix.n), atol=1e-5)
            np.testing.assert_allclose(np.asarray(a.fix.mu),
                                       np.asarray(b.fix.mu), atol=1e-4)
            np.testing.assert_allclose(np.asarray(a.fix.S),
                                       np.asarray(b.fix.S), atol=3e-3)
            np.testing.assert_allclose(np.asarray(a.fix_nv),
                                       np.asarray(b.fix_nv), atol=1e-4)
            # window slots 0..1 cleared in both, slot 2 untouched
            assert float(jnp.sum(a.win.n[mp[0]])) == 0.0
            assert float(jnp.sum(a.win.n[mp[1]])) == 0.0
            np.testing.assert_allclose(np.asarray(a.win.n[mp[2]]),
                                       np.asarray(b.win.n[mp[2]]))
            # consumed tsl rows reset to the sentinel
            C = a.keys.shape[0]
            assert np.all(np.asarray(a.tsl[mp[0]]) == C)
            assert np.all(np.asarray(a.tsl[mp[1]]) == C)

    def test_cap_straddle_mgsize2_matches_full(self, rng):
        """mgsize=2 with fixed counts straddling max_points: the cap is
        checked once against PRE-fold counts (reference margi,
        voxel_map.hpp:1543), so a voxel pushed past the cap by frame 0
        must still absorb frame 1 — sparse and full paths must agree."""
        import dataclasses as dc
        cfg, lv_t, Rs, ps, mp = self._build(np.random.default_rng(11),
                                            track=True)
        _, lv_f, _, _, _ = self._build(np.random.default_rng(11),
                                       track=False)
        # preset fixed counts just below the cap so one frame's fold
        # crosses it (points-per-voxel here is far below max_points)
        def straddle(lvs):
            return tuple(
                dc.replace(l, fix=dc.replace(
                    l.fix, n=jnp.where(jnp.sum(l.win.n, 0) > 0,
                                       jnp.float32(cfg.max_points - 1),
                                       l.fix.n)))
                for l in lvs)
        out_t = vm.marginalize(straddle(lv_t), cfg, Rs, ps, mp, 3, 2)
        out_f = vm.marginalize(straddle(lv_f), cfg, Rs, ps, mp, 3, 2)
        for a, b in zip(out_t, out_f):
            np.testing.assert_allclose(np.asarray(a.fix.n),
                                       np.asarray(b.fix.n), atol=1e-5)
            np.testing.assert_allclose(np.asarray(a.fix.mu),
                                       np.asarray(b.fix.mu), atol=1e-4)
            np.testing.assert_allclose(np.asarray(a.fix_nv),
                                       np.asarray(b.fix_nv), atol=1e-4)
            # the straddled voxels actually absorbed BOTH frames
            assert float(jnp.max(a.fix.n)) > cfg.max_points

    def test_max_points_cap_respected(self, rng):
        """Voxels whose fixed count is already >= max_points must not
        absorb the fold (reference margi cap, voxel_map.hpp:1476)."""
        import dataclasses as dc
        cfg, lv_t, Rs, ps, mp = self._build(np.random.default_rng(3),
                                            track=True)
        # saturate every fixed count past the cap
        lv_sat = tuple(
            dc.replace(l, fix=dc.replace(l.fix,
                                         n=jnp.full_like(l.fix.n, 1e6)))
            for l in lv_t)
        out = vm.marginalize(lv_sat, cfg, Rs, ps, mp, 3, 1)
        # counts unchanged (no fold happened)
        for a, b in zip(out, lv_sat):
            np.testing.assert_array_equal(np.asarray(a.fix.n),
                                          np.asarray(b.fix.n))


def _assert_slab_close(a, b, atol=5e-4):
    """Slab comparison on PLANE rows only (state col 9 == 1), up to the
    eigenvector sign ambiguity: non-plane voxels (e.g. n=2 rank-1
    clusters) have arbitrary rounding-dependent eigenvectors and their
    slabs are never consumed (match and harvest gate on STATE_PLANE);
    the normal is defined up to sign and used sign-insensitively."""
    np.testing.assert_allclose(a[:, 9], b[:, 9], atol=0)
    pl = a[:, 9] == 1.0
    a, b = a[pl], b[pl]
    na, nb = a[:, 0:3], b[:, 0:3]
    flip = (np.einsum("ni,ni->n", na, nb) < 0)[:, None]
    a = a.copy()
    a[:, 0:3] = np.where(flip, -na, na)
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-3)


class TestRunningTotalRefresh:
    """The touched-slot refresh fits planes from the incrementally
    maintained world-frame running total (VoxelLevel.tot) instead of
    re-gathering (W, C) window columns. Right after inserts (poses
    unchanged since insert) the running total must equal the exact
    fix + sum_w transform(win) reduction, so touched == full refresh."""

    def _insert_frames(self, rng, cfg, n_frames=3):
        from voxelslam_tpu.core import so3 as _so3
        levels = vm.empty_map(cfg)
        W = cfg.win_size
        Rs = np.tile(np.eye(3, dtype=np.float32), (W, 1, 1))
        ps = np.zeros((W, 3), np.float32)
        mp = jnp.arange(W, dtype=jnp.int32)
        all_touched = None
        for f in range(n_frames):
            R = np.asarray(_so3.exp(jnp.array(
                rng.normal(0, 0.3, 3).astype(np.float32))))
            p = rng.normal(0, 1.0, 3).astype(np.float32)
            n = 500
            loc = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                            rng.normal(0.5, 0.02, n)], -1).astype(np.float32)
            wld = loc @ R.T + p
            Rs[f], ps[f] = R, p
            levels, touched = vm.insert_scan_fused(
                levels, cfg, jnp.array(wld), jnp.array(loc),
                jnp.full((n,), 1e-4), jnp.ones(n), f, 0.0,
                jnp.array(R), jnp.array(p))
            all_touched = touched
        return levels, jnp.array(Rs), jnp.array(ps), mp, all_touched, \
            n_frames

    def test_touched_matches_full(self, rng):
        cfg = small_test_config().map
        levels, Rs, ps, mp, touched, nf = self._insert_frames(rng, cfg)
        lv_t = vm.refresh_planes(levels, cfg, Rs, ps, mp, nf,
                                 touched=touched)
        lv_f = vm.refresh_planes(levels, cfg, Rs, ps, mp, nf)
        for lt, lf_, (s, sv, _) in zip(lv_t, lv_f, touched):
            si = np.asarray(s)[np.asarray(sv)]
            np.testing.assert_array_equal(
                np.asarray(lt.state)[si], np.asarray(lf_.state)[si])
            _assert_slab_close(np.asarray(lt.slab)[si],
                               np.asarray(lf_.slab)[si])
            pl = np.asarray(lt.state)[si] == vm.STATE_PLANE
            np.testing.assert_allclose(
                np.asarray(lt.lam)[si][pl], np.asarray(lf_.lam)[si][pl],
                atol=1e-5, rtol=1e-3)

    def test_insert_fixed_updates_total(self, rng):
        cfg = small_test_config().map
        levels, Rs, ps, mp, _, nf = self._insert_frames(rng, cfg)
        n = 400
        wld = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                        rng.normal(0.52, 0.02, n)], -1).astype(np.float32)
        levels, touched = vm.insert_fixed_touched(
            levels, cfg, jnp.array(wld), jnp.full((n,), 1e-4),
            jnp.ones(n), 0.0)
        lv_t = vm.refresh_planes(levels, cfg, Rs, ps, mp, nf,
                                 touched=touched)
        lv_f = vm.refresh_planes(levels, cfg, Rs, ps, mp, nf)
        for lt, lf_, (s, sv, _) in zip(lv_t, lv_f, touched):
            si = np.asarray(s)[np.asarray(sv)]
            np.testing.assert_array_equal(
                np.asarray(lt.state)[si], np.asarray(lf_.state)[si])
            _assert_slab_close(np.asarray(lt.slab)[si],
                               np.asarray(lf_.slab)[si])

    def test_full_refresh_resyncs_total(self, rng):
        """After BA moves window poses, a full refresh must overwrite
        the running total with the exact value at the NEW poses."""
        cfg = small_test_config().map
        levels, Rs, ps, mp, touched, nf = self._insert_frames(rng, cfg)
        ps2 = ps + jnp.array([0.05, -0.02, 0.01])
        lv_f = vm.refresh_planes(levels, cfg, Rs, ps2, mp, nf)
        exact, _ = vm.total_cluster_level(lv_f[0], Rs, ps2, mp, nf)
        np.testing.assert_allclose(np.asarray(lv_f[0].tot.mu),
                                   np.asarray(exact.mu), atol=1e-5)
        # and the touched refresh after the resync uses the new totals
        lv_t = vm.refresh_planes(lv_f, cfg, Rs, ps2, mp, nf,
                                 touched=touched)
        lv_f2 = vm.refresh_planes(lv_f, cfg, Rs, ps2, mp, nf)
        s, sv, _ = touched[0]
        si = np.asarray(s)[np.asarray(sv)]
        _assert_slab_close(np.asarray(lv_t[0].slab)[si],
                           np.asarray(lv_f2[0].slab)[si])
