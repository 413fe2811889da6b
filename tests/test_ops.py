"""Unit tests for core math ops: SVD3, quaternions, SDFs, metrics, gradops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidom_tpu.ops import svd3, svd3_jacobi, qmul, w2quat, qrot, qrot_inv
from unidom_tpu.ops.metrics import chamfer, l2_distance, project_to_map, voxel_iou
from unidom_tpu.ops.sdf import SDF_REGISTRY, sdf_normal, sdf_box
from unidom_tpu.ops.gradops import (
    clamp_grad_norm_tree,
    global_norm_clip,
    normalize_grad,
    scrub_grad,
)


class TestSVD3:
    def _random_batch(self, key, n=64, scale=1.0, near_identity=False):
        A = jax.random.normal(key, (n, 3, 3)) * scale
        if near_identity:
            A = jnp.eye(3)[None] + 0.1 * A
        return A

    @pytest.mark.parametrize("near_identity", [True, False])
    def test_reconstruction(self, near_identity):
        A = self._random_batch(jax.random.PRNGKey(0), near_identity=near_identity)
        U, S, Vh = svd3_jacobi(A)
        recon = (U * S[..., None, :]) @ Vh
        np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=2e-5)

    def test_orthogonality_and_sign(self):
        A = self._random_batch(jax.random.PRNGKey(1))
        U, S, Vh = svd3_jacobi(A)
        I = np.eye(3)[None].repeat(A.shape[0], 0)
        np.testing.assert_allclose(np.asarray(U @ U.transpose(0, 2, 1)), I, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Vh @ Vh.transpose(0, 2, 1)), I, atol=1e-4)
        assert np.all(np.asarray(S) >= 0)
        # sorted descending
        assert np.all(np.diff(np.asarray(S), axis=-1) <= 1e-6)

    def test_matches_lapack_singular_values(self):
        A = self._random_batch(jax.random.PRNGKey(2))
        _, S, _ = svd3_jacobi(A)
        S_ref = np.linalg.svd(np.asarray(A), compute_uv=False)
        np.testing.assert_allclose(np.asarray(S), S_ref, atol=1e-4)

    def test_degenerate_rank1(self):
        u = jnp.array([[1.0, 2.0, 3.0]])
        A = (u[:, :, None] @ u[:, None, :]).repeat(4, 0)  # rank-1
        U, S, Vh = svd3_jacobi(A)
        recon = (U * S[..., None, :]) @ Vh
        np.testing.assert_allclose(np.asarray(recon), np.asarray(A), atol=1e-4)

    def test_vjp_matches_finite_difference(self):
        key = jax.random.PRNGKey(3)
        A = jnp.eye(3)[None] + 0.3 * jax.random.normal(key, (8, 3, 3))

        def loss(A):
            U, S, Vh = svd3(A)
            return jnp.sum(S**2) + jnp.sum(U[..., 0, 0]) + jnp.sum(Vh[..., 0, 0])

        g = jax.grad(loss)(A)
        eps = 1e-3
        # check a few random directions with central differences
        for seed in range(3):
            d = jax.random.normal(jax.random.PRNGKey(seed), A.shape)
            fd = (loss(A + eps * d) - loss(A - eps * d)) / (2 * eps)
            ad = jnp.sum(g * d)
            np.testing.assert_allclose(np.asarray(fd), np.asarray(ad), rtol=2e-2, atol=1e-3)

    def test_vjp_finite_on_degenerate(self):
        A = jnp.eye(3)[None].repeat(4, 0)  # all singular values equal

        def loss(A):
            U, S, Vh = svd3(A)
            return jnp.sum(S) + jnp.sum(U * 0.1)

        g = jax.grad(loss)(A)
        assert np.all(np.isfinite(np.asarray(g)))


class TestQuat:
    def test_w2quat_identity(self):
        q = w2quat(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-6)

    def test_qrot_matches_rotation_matrix(self):
        axis_angle = jnp.array([0.3, -0.5, 0.7])
        q = w2quat(axis_angle)
        v = jnp.array([[1.0, 2.0, 3.0], [0.0, -1.0, 0.5]])
        out = qrot(q, v)

        # build rotation matrix from axis-angle with scipy-free Rodrigues
        theta = float(jnp.linalg.norm(axis_angle))
        k = np.asarray(axis_angle) / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        Rm = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
        np.testing.assert_allclose(np.asarray(out), (Rm @ np.asarray(v).T).T, atol=1e-5)

    def test_qmul_compose(self):
        a = w2quat(jnp.array([0.1, 0.2, 0.3]))
        b = w2quat(jnp.array([-0.2, 0.5, 0.1]))
        v = jnp.array([[0.3, 0.1, -0.2]])
        lhs = qrot(qmul(a, b), v)
        rhs = qrot(a, qrot(b, v))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    def test_qrot_inv_roundtrip(self):
        q = w2quat(jnp.array([0.4, -0.1, 0.9]))
        v = jnp.array([[1.0, -2.0, 0.3]])
        np.testing.assert_allclose(np.asarray(qrot_inv(q, qrot(q, v))), np.asarray(v), atol=1e-5)


class TestSDF:
    @pytest.mark.parametrize("name", list(SDF_REGISTRY.keys()))
    def test_normal_matches_finite_difference(self, name):
        """Property test in the style of plb test_primitives.py:6-52."""
        sdf = SDF_REGISTRY[name]
        size = {
            "box": jnp.array([0.2, 0.1, 0.15]),
            "sphere": jnp.array([0.25, 0.0, 0.0]),
            "capsule": jnp.array([0.1, 0.2, 0.0]),
            "cylinder": jnp.array([0.15, 0.2, 0.0]),
            "torus": jnp.array([0.3, 0.08, 0.0]),
            "rolling_pin": jnp.array([0.1, 0.25, 0.0]),
            "chopsticks": jnp.array([0.05, 0.2, 0.12]),
            "container": jnp.array([0.3, 0.1, 0.03]),
        }[name]
        normal = sdf_normal(sdf)
        key = jax.random.PRNGKey(0)
        p = jax.random.uniform(key, (256, 3), minval=-0.6, maxval=0.6)
        # keep away from the exact surface/axis singularities
        d = sdf(size, p)
        keep = jnp.abs(d) > 1e-3
        n_ad = normal(size, p)

        eps = 1e-4
        n_fd = []
        for axis in range(3):
            e = jnp.zeros(3).at[axis].set(eps)
            n_fd.append((sdf(size, p + e) - sdf(size, p - e)) / (2 * eps))
        n_fd = jnp.stack(n_fd, axis=-1)
        n_fd = n_fd / jnp.linalg.norm(n_fd, axis=-1, keepdims=True)

        err = jnp.linalg.norm(n_ad - n_fd, axis=-1)
        assert float(jnp.where(keep, err, 0.0).max()) < 1e-2

    def test_box_inside_outside(self):
        size = jnp.array([0.1, 0.1, 0.1])
        assert float(sdf_box(size, jnp.zeros(3))) < 0
        assert float(sdf_box(size, jnp.array([0.5, 0.5, 0.5]))) > 0
        np.testing.assert_allclose(
            float(sdf_box(size, jnp.array([0.2, 0.0, 0.0]))), 0.1, atol=1e-6
        )


class TestMetrics:
    def test_chamfer_zero_for_identical(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 50, 3))
        d = chamfer(x, x[0])
        # Gram-expansion f32 cancellation puts a ~1e-4 floor on self-distance
        assert float(d[0]) < 1e-3

    def test_chamfer_matches_naive(self):
        key = jax.random.PRNGKey(1)
        x = jax.random.uniform(key, (2, 20, 3))
        y = jax.random.uniform(jax.random.PRNGKey(2), (15, 3))
        d = chamfer(x, y)

        xn, yn = np.asarray(x), np.asarray(y)
        naive = []
        for b in range(2):
            dm = np.sqrt(((xn[b][:, None, :] - yn[None, :, :]) ** 2).mean(-1))
            naive.append(dm.min(1).mean() + dm.min(0).mean())
        np.testing.assert_allclose(np.asarray(d), naive, rtol=1e-5)

    def test_l2(self):
        x = jnp.ones((2, 10, 3)) * 0.5
        goal = jnp.zeros((10, 3))
        np.testing.assert_allclose(np.asarray(l2_distance(x, goal)), 0.5, atol=1e-6)

    def test_project_and_voxel_iou(self):
        x = jnp.array([[[0.1, 0.0, 0.1], [0.9, 0.0, 0.9]]])
        m = project_to_map(x, size=16)
        assert float(m.sum()) == 2.0
        assert voxel_iou(np.asarray(x[0]), np.asarray(x[0])) == 1.0


class TestGradOps:
    def test_clamp_grad_norm(self):
        def f(x):
            y = clamp_grad_norm_tree(x * 1e6)
            return jnp.sum(y)

        g = jax.grad(f)(jnp.ones((4,)))
        # upstream cotangent of x*1e6 wrt x is 1e6 * clamped(ones) -> norm clamp to 1 first
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(g)) / 1e6, 1.0, rtol=1e-5)

    def test_normalize_grad(self):
        norm = normalize_grad(scale=10.0)

        def f(x):
            return jnp.sum(norm(x) * jnp.array([3.0, 4.0, 0.0]))

        g = jax.grad(f)(jnp.zeros(3))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(g)), 1.0 / 10.0, rtol=1e-5)

    def test_scrub_grad_kills_nan(self):
        def f(x):
            y = scrub_grad(x)
            return jnp.sum(jnp.where(x > 0, jnp.log(y), y))

        g = jax.grad(f)(jnp.array([0.0, -1.0]))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_global_norm_clip(self):
        g = {"a": jnp.ones(4) * 10.0}
        clipped = global_norm_clip(g, 0.3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(clipped["a"])), 0.3, rtol=1e-5)
        small = {"a": jnp.ones(4) * 0.01}
        same = global_norm_clip(small, 0.3)
        np.testing.assert_allclose(np.asarray(same["a"]), 0.01, rtol=1e-6)


def test_chamfer_chunked_matches_dense():
    """The chunked+remat chamfer path (engaged at large B*Nx*Ny) must equal
    the dense Gram path, values and gradients."""
    import unidom_tpu.ops.metrics as M

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 256, 3))
    goal = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))

    dense = M.chamfer(x, goal)
    orig = M._CHAMFER_DENSE_LIMIT
    try:
        M._CHAMFER_DENSE_LIMIT = 0  # force the chunked path
        chunked = M.chamfer(x, goal)
        g_dense_fn = jax.grad(lambda x_: M.chamfer(x_, goal).sum())
        M._CHAMFER_DENSE_LIMIT = orig
        g_dense = g_dense_fn(x)
        M._CHAMFER_DENSE_LIMIT = 0
        g_chunked = jax.grad(lambda x_: M.chamfer(x_, goal).sum())(x)
    finally:
        M._CHAMFER_DENSE_LIMIT = orig

    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_chunked), np.asarray(g_dense), rtol=1e-3, atol=1e-5)
