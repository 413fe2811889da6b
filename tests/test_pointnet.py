"""PointNet++ ops and model tests (vs naive numpy references)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.models.pointnet_ops import (
    ball_query,
    farthest_point_sample,
    gather_points,
    group_points,
    prob_sample,
    three_interpolate,
    three_nn,
)
from unidom_tpu.models.pointnet2 import DenseHead, PointNet2Cls, PointNet2Para


class TestOps:
    def test_fps_spreads_points(self):
        # two well-separated clusters: FPS with 2 samples must hit both
        a = np.random.RandomState(0).randn(50, 3) * 0.01
        b = a + np.array([10.0, 0, 0])
        pts = jnp.asarray(np.concatenate([a, b])[None])
        idx = farthest_point_sample(pts, 2)
        assert int(idx[0, 0]) == 0
        assert int(idx[0, 1]) >= 50  # second sample lands in the far cluster

    def test_fps_unique_count(self):
        pts = jnp.asarray(np.random.RandomState(1).rand(1, 100, 3))
        idx = np.asarray(farthest_point_sample(pts, 32))
        assert len(np.unique(idx[0])) == 32

    def test_ball_query_first_k_semantics(self):
        xyz = jnp.asarray(np.array([[[0, 0, 0], [0.05, 0, 0], [5, 5, 5],
                                     [0.08, 0, 0], [0.01, 0, 0]]], np.float32))
        centers = xyz[:, :1]
        idx = np.asarray(ball_query(0.1, 3, xyz, centers))[0, 0]
        # first 3 in-radius points in index order: 0, 1, 3
        assert list(idx) == [0, 1, 3]

    def test_ball_query_padding(self):
        xyz = jnp.asarray(np.array([[[0, 0, 0], [5, 5, 5], [6, 6, 6]]], np.float32))
        centers = xyz[:, :1]
        idx = np.asarray(ball_query(0.1, 4, xyz, centers))[0, 0]
        assert list(idx) == [0, 0, 0, 0]  # padded with first hit

    def test_three_nn_and_interpolate(self):
        known = jnp.asarray(np.random.RandomState(0).rand(1, 20, 3).astype(np.float32))
        unknown = known[:, :5] + 1e-4
        dist, idx = three_nn(unknown, known)
        assert np.all(np.asarray(idx[0, :, 0]) == np.arange(5))
        feat = jnp.asarray(np.random.RandomState(1).rand(1, 20, 4).astype(np.float32))
        out = three_interpolate(feat, idx, dist)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(feat[0, :5]), atol=1e-2)

    def test_group_points_grad(self):
        pts = jnp.asarray(np.random.RandomState(0).rand(1, 10, 3).astype(np.float32))
        idx = jnp.zeros((1, 2, 4), jnp.int32)
        g = jax.grad(lambda p: group_points(p, idx).sum())(pts)
        assert float(g[0, 0].sum()) == 8 * 3  # 2x4 groups all hit point 0

    def test_prob_sample(self):
        w = jnp.asarray([[0.0, 0.0, 1.0, 0.0]])
        idx = prob_sample(w, jax.random.PRNGKey(0), 16)
        assert np.all(np.asarray(idx) == 2)


class TestModels:
    def test_regressor_forward(self):
        model = PointNet2Cls(out_dim=2)
        pts = jnp.asarray(np.random.RandomState(0).rand(2, 600, 3).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), pts)
        out = model.apply(params, pts)
        assert out.shape == (2, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_para_policy_conditions_on_params(self):
        model = PointNet2Para(action_dim=6)
        pts = jnp.asarray(np.random.RandomState(0).rand(1, 600, 3).astype(np.float32))
        p1 = jnp.asarray([[0.1, 0.2]])
        p2 = jnp.asarray([[0.9, 0.8]])
        params = model.init(jax.random.PRNGKey(0), pts, p1)
        a1 = model.apply(params, pts, p1)
        a2 = model.apply(params, pts, p2)
        assert a1.shape == (1, 6)
        assert not np.allclose(np.asarray(a1), np.asarray(a2))

    def test_dense_head(self):
        m = DenseHead(out_dim=3, hidden=(8,))
        x = jnp.ones((4, 5))
        p = m.init(jax.random.PRNGKey(0), x, jnp.ones((4, 2)))
        out = m.apply(p, x, jnp.ones((4, 2)))
        assert out.shape == (4, 3)


class TestIdentifyPipeline:
    def test_end_to_end_tiny(self, tmp_path):
        """Expert factory -> dataset -> regressor fit -> predict round-trip."""
        from unidom_tpu.algorithms.identify import ParameterRegressor, load_expert_dataset
        from unidom_tpu.algorithms.solver import generate_experts
        from unidom_tpu.engine.cloth import ClothConf
        from unidom_tpu.envs.cloth_tasks import FoldCloth1Env

        conf = ClothConf(N=20, stiffness=900.0, mem_saving_level=1, n_substeps=10,
                         gripper_radius=0.08, task="t", goal_path="")
        env = FoldCloth1Env(batch_size=2, conf=conf, aux_reward=True)
        generate_experts(env, str(tmp_path), n_instances=2, horizon=1,
                         solver_iters=1, param_ranges={"stiffness": (500.0, 1500.0)})
        clouds, targets = load_expert_dataset(str(tmp_path), ["stiffness"], n_points=64)
        assert clouds.shape == (4, 64, 3)
        assert targets.shape == (4, 1)

        reg = ParameterRegressor(n_params=1, lr=1e-3)
        hist = reg.fit(clouds, targets, epochs=2, batch_size=2)
        assert np.all(np.isfinite(hist))
        pred = reg.predict(clouds)
        assert pred.shape == (4, 1)
        assert np.all(np.isfinite(pred))
