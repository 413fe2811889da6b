"""Coverage smoke tests for the remaining task envs (small confs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidom_tpu.engine.mpm import MPMConf


class TestPourWater:
    def test_smoke(self):
        from unidom_tpu.envs.mpm_tasks import PourWaterEnv

        conf = MPMConf(n_grid=32, dt=4e-4, steps=6, E=5e-5, nu=0.4999,
                       res=(16, 12, 16), n_primitive=2, task="pour_water",
                       goal_path="")
        env = PourWaterEnv(batch_size=2, seed=1, max_steps=5, conf=conf)
        obs, state = env.reset(jax.random.PRNGKey(0))
        assert len(state.primitives) == 2  # two bowls
        actions = jnp.zeros((2, 6)).at[:, 0].set(1.0)
        obs, reward, done, info = env.step_diff(actions, state)
        assert np.all(np.isfinite(np.asarray(reward)))
        assert np.all(np.isfinite(np.asarray(info["state"].x)))


class TestPourSoup:
    def test_mixture_materials(self):
        from unidom_tpu.engine.mpm import ELASTIC, WATER
        from unidom_tpu.envs.mpm_tasks import PourSoupEnv

        conf = MPMConf(n_grid=32, dt=4e-4, steps=5, E=5e-5, nu=0.4999,
                       res=(20, 14, 20), n_primitive=2, task="pour_soup",
                       goal_path="")
        env = PourSoupEnv(batch_size=1, seed=1, max_steps=4, conf=conf)
        obs, state = env.reset(jax.random.PRNGKey(0))
        mats = np.asarray(env.simulator.material)
        assert (mats == WATER).sum() > 0 and (mats == ELASTIC).sum() > 0
        obs, reward, done, info = env.step_diff(jnp.zeros((1, 6)), state)
        assert np.all(np.isfinite(np.asarray(info["state"].x)))


class TestElastoPlastic:
    def test_push_deforms_plastically(self):
        from unidom_tpu.envs.mpm_tasks import ShapeElastoPlasticEnv

        conf = MPMConf(n_grid=32, dt=2e-4, steps=5, E=2.0, nu=0.2,
                       ground_friction=2.0, res=(16, 12, 16),
                       task="elasto", goal_path="")

        class Small(ShapeElastoPlasticEnv):
            PUSH_SUBSTEPS = 3
            ROPE_WIDTH = (0.15, 0.05, 0.1)

        env = Small(batch_size=1, seed=1, max_steps=4, conf=conf)
        obs, state = env.reset(jax.random.PRNGKey(0))
        x0 = np.asarray(state.x[0])
        actions = jnp.asarray([[0.35, 0, 0.5, 0.55, 0, 0.5]])
        obs, reward, done, info = env.step_diff(actions, state)
        x1 = np.asarray(info["state"].x[0])
        assert np.all(np.isfinite(x1))
        assert np.abs(x1 - x0).max() > 1e-4  # something moved


class TestTshirt:
    def test_mask_and_reset(self):
        from unidom_tpu.engine.cloth import ClothConf
        from unidom_tpu.envs.cloth_tasks import FoldTshirtEnv, _tshirt_mask

        mask = np.asarray(_tshirt_mask(60))
        assert mask.sum() > 100  # a real silhouette
        # sleeves make it wider at the top than the waist
        conf = ClothConf(N=60, stiffness=5000.0, dt=0.5e-3, mu=0.9,
                         mem_saving_level=1, n_substeps=5, task="tshirt",
                         goal_path="")
        env = FoldTshirtEnv(batch_size=1, conf=conf)
        obs, state = env.reset(jax.random.PRNGKey(0))
        assert obs.shape == (1, env.observation_size)


class TestResume:
    def test_apg_checkpoint_resume(self, tmp_path):
        """Save at it=0, resume, continue — params must round-trip."""
        import pickle

        from unidom_tpu.algorithms.apg import build_apg
        from unidom_tpu.engine.cloth import ClothConf
        from unidom_tpu.envs.cloth_tasks import FoldCloth1Env
        from unidom_tpu.parallel.mesh import make_env_mesh

        conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5,
                         gripper_radius=0.08, task="t", goal_path="")
        env = FoldCloth1Env(batch_size=1, conf=conf)
        init_ts, minimize, reset_batch, _ = build_apg(env, 2, mesh=make_env_mesh())
        ts = init_ts(0)
        state = reset_batch(jax.random.PRNGKey(0))
        ts, _ = minimize(ts, state)

        path = tmp_path / "ck.pkl"
        with open(path, "wb") as f:
            pickle.dump(jax.device_get({
                "policy_params": ts.policy_params,
                "optimizer_state": ts.optimizer_state,
            }), f)
        with open(path, "rb") as f:
            saved = pickle.load(f)

        ts2 = init_ts(1)._replace(
            policy_params=saved["policy_params"],
            optimizer_state=saved["optimizer_state"],
        )
        for a, b in zip(jax.tree_util.tree_leaves(ts.policy_params),
                        jax.tree_util.tree_leaves(ts2.policy_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ts3, metrics = minimize(ts2, state)
        assert np.isfinite(float(metrics["reward"]))


def test_depth_obs_type():
    """DEPTH observation switch (reference cloth_env.py:97-132): (B,320,320,1)
    heightmap; highest particle wins each pixel."""
    from unidom_tpu.engine.cloth import ClothConf
    from unidom_tpu.envs.cloth_tasks import FoldCloth1Env

    conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5, task="t", goal_path="")
    env = FoldCloth1Env(batch_size=2, conf=conf, obs_type="DEPTH")
    assert env.observation_size == 320 * 320
    _, state = env.reset(jax.random.PRNGKey(0))
    obs = env.get_obs(state)
    assert obs.shape == (2, 320, 320, 1)
    o = np.asarray(obs)
    assert np.isfinite(o).all()
    assert (o > 0).sum() > 0  # cloth leaves a footprint

    import pytest
    with pytest.raises(NotImplementedError):
        FoldCloth1Env(batch_size=1, conf=conf, obs_type="RGB")
