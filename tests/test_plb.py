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


NEW_SCENES = ["plb_writer", "plb_pinch", "plb_rollingpin", "plb_chopsticks",
              "plb_triplemove", "plb_assembly"]


class TestNewFamilySolver:
    """Round-5 families (Writer/Pinch/Rollingpin/Chopsticks/TripleMove/
    Assembly): the trajectory solver must improve the plb reward (= target-
    loss decrease) through each scene's primitive kinematics."""

    @pytest.mark.parametrize("scene", NEW_SCENES)
    def test_solver_improves_loss(self, scene):
        from unidom_tpu.algorithms.solver import TrajectorySolver

        conf = replace(SMALL, n_primitive=len(PLB_SCENES[scene]["primitives"]),
                       task=scene)
        env = PlbSceneEnv(scene, batch_size=1, conf=conf, max_steps=2)
        _, state = env.reset(jax.random.PRNGKey(0))
        solver = TrajectorySolver(env, horizon=2, lr=0.1)
        actions0 = solver.init_actions(jax.random.PRNGKey(1), scale=0.1)
        _, (r0, _) = solver._rollout_loss(actions0, state)
        _, best_reward, history = solver.solve(
            state, jax.random.PRNGKey(1), n_iters=6, actions=actions0
        )
        assert np.all(np.isfinite(history)), history
        assert max(history) >= history[0] - 1e-6
        assert float(best_reward.mean()) >= float(r0.sum(0).mean()) - 1e-6

    def test_chopsticks_gap_closes(self):
        """The 7th chopsticks dof drives the traced gap (primitive size[2])
        down toward the clamp (reference minimal_gap 0.06 -> half 0.03)."""
        scene = "plb_chopsticks"
        conf = replace(SMALL, n_primitive=1, task=scene)
        env = PlbSceneEnv(scene, batch_size=1, conf=conf, max_steps=3)
        _, state = env.reset(jax.random.PRNGKey(0))
        gap0 = float(state.primitives[0].size[0, 2])
        a = jnp.zeros((1, env.action_size)).at[0, 6].set(1.0)
        _, _, _, info = env.step_diff(a, state)
        gap1 = float(info["state"].primitives[0].size[0, 2])
        assert gap1 < gap0
        for _ in range(12):
            _, _, _, info = env.step_diff(a, info["state"])
        assert float(info["state"].primitives[0].size[0, 2]) >= 0.03 - 1e-6

    def test_rollingpin_descends_and_rolls(self):
        scene = "plb_rollingpin"
        conf = replace(SMALL, n_primitive=1, task=scene)
        env = PlbSceneEnv(scene, batch_size=1, conf=conf, max_steps=3)
        _, state = env.reset(jax.random.PRNGKey(0))
        y0 = float(state.primitives[0].position[0, 0, 1])
        a = jnp.asarray([[0.5, 0.2, -1.0]])  # roll, yaw, descend
        _, _, _, info = env.step_diff(a, state)
        pr = info["state"].primitives[0]
        assert float(pr.position[0, 0, 1]) < y0  # descended
        q = np.asarray(pr.rotation[0, 0])
        assert abs(1.0 - abs(q[0])) > 1e-5  # rotated off identity
