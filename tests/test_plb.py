"""PlasticineLab task family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from unidom_tpu.engine.mpm import MPMConf
from unidom_tpu.envs.plb_tasks import PLB_BASE_CONF, PLB_SCENES, PlbSceneEnv

SMALL = replace(PLB_BASE_CONF, n_grid=32, steps=5, res=(32, 32, 32))


class TestPlbScenes:
    @pytest.mark.parametrize("scene", list(PLB_SCENES.keys()))
    def test_scene_builds_and_steps(self, scene):
        conf = replace(SMALL, n_primitive=len(PLB_SCENES[scene]["primitives"]),
                       task=scene)
        env = PlbSceneEnv(scene, batch_size=1, conf=conf, max_steps=4)
        obs, state = env.reset(jax.random.PRNGKey(0))
        assert env.simulator.n_particles >= 1000
        a = jnp.ones((1, env.action_size)) * 0.5
        obs, reward, done, info = env.step_diff(a, state)
        assert np.all(np.isfinite(np.asarray(reward)))
        assert np.all(np.isfinite(np.asarray(info["state"].x)))

    def test_reward_is_loss_decrease(self):
        scene = "plb_move"
        conf = replace(SMALL, task=scene)
        env = PlbSceneEnv(scene, batch_size=1, conf=conf, max_steps=4)
        obs, state = env.reset(jax.random.PRNGKey(0))
        # zero action: reward ~ start_loss - current_loss ~ small
        obs, r0, done, info = env.step_diff(jnp.zeros((1, 3)), state)
        assert np.isfinite(float(r0[0]))
        out = env.loss_info(info["state"])
        assert "incremental_iou" in out and "sdf_loss" in out

    def test_registry(self):
        from unidom_tpu.envs.registration import env_functions

        for name in PLB_SCENES:
            assert name in env_functions

    def test_differentiable(self):
        conf = replace(SMALL, task="plb_move")
        env = PlbSceneEnv("plb_move", batch_size=1, conf=conf, max_steps=3)
        obs, state = env.reset(jax.random.PRNGKey(0))

        def loss(a, state):
            _, r, _, _ = env.step_diff(a, state)
            return -r.mean()

        g = jax.grad(loss)(jnp.ones((1, 3)) * 0.3, state)
        assert np.all(np.isfinite(np.asarray(g)))
