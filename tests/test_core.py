import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelslam_tpu.core import so3, eig3, cluster
from voxelslam_tpu.core.state import NavState


def random_rotations(rng, n):
    # uniform-ish random rotations via QR
    q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    return q.astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(256, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True)
        scales = rng.uniform(0, 3.0, size=(256, 1)).astype(np.float32)
        w = w * scales
        R = so3.exp(jnp.array(w))
        w2 = np.asarray(so3.log(R))
        np.testing.assert_allclose(w2, w, atol=2e-4)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(R)))

    def test_log_near_pi(self):
        axis = np.array([0.3, -0.5, 0.81])
        axis /= np.linalg.norm(axis)
        for ang in [3.05, 3.12, np.pi - 1e-4]:
            w = (axis * ang).astype(np.float32)
            R = so3.exp(jnp.array(w))
            w2 = np.asarray(so3.log(R))
            # log may return the equivalent rotation; compare rotations
            R2 = np.asarray(so3.exp(jnp.array(w2)))
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)

    def test_exp_orthonormal(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        R = np.asarray(so3.exp(jnp.array(w)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_jr_numeric(self, rng):
        # Exp(w + dw) ~ Exp(w) Exp(jr(w) dw)
        w = rng.normal(size=(16, 3)).astype(np.float64) * 1.5
        dw = rng.normal(size=(16, 3)) * 1e-5
        R1 = np.asarray(so3.exp(jnp.array(w + dw, dtype=jnp.float32)), dtype=np.float64)
        Jr = np.asarray(so3.jr(jnp.array(w, dtype=jnp.float32)), dtype=np.float64)
        R2 = np.asarray(so3.exp(jnp.array(w, dtype=jnp.float32)), dtype=np.float64) @ np.asarray(
            so3.exp(jnp.array(np.einsum("nij,nj->ni", Jr, dw), dtype=jnp.float32)),
            dtype=np.float64,
        )
        np.testing.assert_allclose(R1, R2, atol=1e-6)

    def test_jr_inv(self, rng):
        w = rng.normal(size=(32, 3)).astype(np.float32)
        J = np.asarray(so3.jr(jnp.array(w)))
        Ji = np.asarray(so3.jr_inv(jnp.array(w)))
        eye = np.einsum("nij,njk->nik", J, Ji)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-4)


class TestEig3:
    def _check(self, A, atol_w=1e-5, atol_res=1e-4):
        w, V = eig3.eigh3(jnp.array(A, dtype=jnp.float32))
        w = np.asarray(w, dtype=np.float64)
        V = np.asarray(V, dtype=np.float64)
        w_ref = np.linalg.eigvalsh(A.astype(np.float64))
        scale = np.maximum(np.abs(w_ref).max(axis=-1), 1.0)
        np.testing.assert_allclose(w / scale[..., None], w_ref / scale[..., None],
                                   atol=atol_w)
        # residual check: A V = V diag(w)
        res = np.einsum("...ij,...jk->...ik", A, V) - V * w[..., None, :]
        assert np.max(np.abs(res) / scale[..., None, None]) < atol_res
        # orthonormality
        VtV = np.einsum("...ji,...jk->...ik", V, V)
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-4)

    def test_random(self, rng):
        B = rng.normal(size=(512, 3, 3))
        A = (B + B.transpose(0, 2, 1)) * 0.5
        self._check(A)

    def test_planar(self, rng):
        # near-planar covariances: lambda0 << lambda1 ~ lambda2
        R = random_rotations(rng, 128).astype(np.float64)
        lam = np.stack(
            [rng.uniform(1e-6, 1e-3, 128), rng.uniform(0.1, 1.0, 128),
             rng.uniform(1.0, 4.0, 128)], axis=-1)
        A = np.einsum("nij,nj,nkj->nik", R, lam, R)
        self._check(A, atol_w=2e-6, atol_res=5e-4)

    def test_isotropic_and_degenerate(self):
        A = np.stack([
            np.eye(3) * 2.0,
            np.diag([1.0, 1.0, 5.0]),
            np.diag([1.0, 5.0, 5.0]),
            np.zeros((3, 3)),
        ])
        self._check(A)

    def test_ascending(self, rng):
        B = rng.normal(size=(64, 3, 3))
        A = (B + B.transpose(0, 2, 1)) * 0.5
        w, _ = eig3.eigh3(jnp.array(A, dtype=jnp.float32))
        w = np.asarray(w)
        assert np.all(np.diff(w, axis=-1) >= -1e-5)

    def test_jvp_eigenvalue(self, rng):
        B = rng.normal(size=(8, 3, 3))
        A = ((B + B.transpose(0, 2, 1)) * 0.5).astype(np.float32)
        dB = rng.normal(size=(8, 3, 3)).astype(np.float32) * 1e-3
        dA = (dB + dB.transpose(0, 2, 1)) * 0.5

        def f(x):
            w, _ = eig3.eigh3(x)
            return w

        w0 = np.asarray(f(jnp.array(A)))
        w1 = np.asarray(f(jnp.array(A + dA)))
        _, dw = jax.jvp(f, (jnp.array(A),), (jnp.array(dA),))
        np.testing.assert_allclose(np.asarray(dw), w1 - w0, atol=1e-4)

    def test_grad_of_min_eig(self, rng):
        # d lambda0 / dA = u0 u0^T
        B = rng.normal(size=(3, 3))
        A = ((B + B.T) * 0.5).astype(np.float32)

        def f(x):
            w, _ = eig3.eigh3(x)
            return w[0]

        g = np.asarray(jax.grad(f)(jnp.array(A)))
        w, V = eig3.eigh3(jnp.array(A))
        u0 = np.asarray(V)[:, 0]
        np.testing.assert_allclose(g, np.outer(u0, u0), atol=1e-5)


class TestCluster:
    def test_from_points_matches_numpy(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32) * 2 + 5
        c = cluster.from_points(jnp.array(pts))
        np.testing.assert_allclose(np.asarray(c.mu), pts.mean(0), atol=1e-5)
        d = pts - pts.mean(0)
        np.testing.assert_allclose(np.asarray(c.S), d.T @ d, rtol=1e-4, atol=1e-4)

    def test_merge_equals_concat(self, rng):
        a = rng.normal(size=(40, 3)).astype(np.float32)
        b = rng.normal(size=(60, 3)).astype(np.float32) + 3
        ca = cluster.from_points(jnp.array(a))
        cb = cluster.from_points(jnp.array(b))
        cm = cluster.merge(ca, cb)
        cref = cluster.from_points(jnp.array(np.concatenate([a, b])))
        np.testing.assert_allclose(np.asarray(cm.mu), np.asarray(cref.mu), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cm.S), np.asarray(cref.S), rtol=1e-4, atol=1e-3)

    def test_subtract_inverts_merge(self, rng):
        a = rng.normal(size=(50, 3)).astype(np.float32)
        b = rng.normal(size=(30, 3)).astype(np.float32) + 1
        ca = cluster.from_points(jnp.array(a))
        cb = cluster.from_points(jnp.array(b))
        cm = cluster.merge(ca, cb)
        back = cluster.subtract(cm, cb)
        np.testing.assert_allclose(np.asarray(back.mu), np.asarray(ca.mu), atol=1e-4)
        np.testing.assert_allclose(np.asarray(back.S), np.asarray(ca.S), rtol=1e-3, atol=1e-3)

    def test_transform_matches_pointwise(self, rng):
        pts = rng.normal(size=(80, 3)).astype(np.float32)
        R = random_rotations(rng, 1)[0]
        t = np.array([100.0, -50.0, 3.0], np.float32)
        c = cluster.from_points(jnp.array(pts))
        ct = cluster.transform(c, jnp.array(R), jnp.array(t))
        cref = cluster.from_points(jnp.array(pts @ R.T + t))
        np.testing.assert_allclose(np.asarray(ct.mu), np.asarray(cref.mu), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ct.S), np.asarray(cref.S), rtol=1e-3, atol=1e-3)

    def test_far_from_origin_precision(self, rng):
        # The whole reason for centered moments: clusters 1 km from origin
        # must keep accurate covariance in f32.
        pts = (rng.normal(size=(200, 3)) * 0.1 + np.array([1000.0, -800.0, 50.0]))
        c = cluster.from_points(jnp.array(pts.astype(np.float32)))
        cv = np.asarray(cluster.cov(c), dtype=np.float64)
        d = pts - pts.mean(0)
        cv_ref = (d.T @ d) / len(pts)
        np.testing.assert_allclose(cv, cv_ref, atol=1e-4)

    def test_empty_cluster(self):
        c = cluster.Cluster.empty((4,))
        m = cluster.merge(c, c)
        assert np.all(np.asarray(m.n) == 0)
        assert np.all(np.isfinite(np.asarray(m.mu)))


class TestNavState:
    def test_boxplus_boxminus(self, rng):
        s = NavState.identity()
        dx = jnp.array(rng.normal(size=(15,)).astype(np.float32) * 0.1)
        s2 = s.boxplus(dx)
        back = s2.boxminus(s)
        np.testing.assert_allclose(np.asarray(back), np.asarray(dx), atol=1e-5)

    def test_batched(self, rng):
        s = NavState.identity((10,))
        assert s.R.shape == (10, 3, 3)
        dx = jnp.array(rng.normal(size=(10, 15)).astype(np.float32) * 0.1)
        s2 = s.boxplus(dx)
        np.testing.assert_allclose(np.asarray(s2.boxminus(s)), np.asarray(dx), atol=1e-5)
        s0 = s2[3]
        assert s0.R.shape == (3, 3)
