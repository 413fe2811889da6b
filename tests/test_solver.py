"""Trajectory solver + para-trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidom_tpu.algorithms.solver import SolverNN, TrajectorySolver, generate_experts
from unidom_tpu.algorithms.apg_para import randomize_stiffness
from unidom_tpu.engine.cloth import ClothConf
from unidom_tpu.envs.cloth_tasks import FoldCloth1Env


@pytest.fixture(scope="module")
def env():
    conf = ClothConf(N=20, stiffness=900.0, mem_saving_level=1, n_substeps=10,
                     gripper_radius=0.08, task="t", goal_path="")
    return FoldCloth1Env(batch_size=2, conf=conf, aux_reward=True)


class TestTrajectorySolver:
    def test_solver_improves_reward(self, env):
        _, state = env.reset(jax.random.PRNGKey(0))
        solver = TrajectorySolver(env, horizon=2, lr=0.05)
        actions0 = solver.init_actions(jax.random.PRNGKey(1))
        _, (r0, _) = solver._rollout_loss(actions0, state)
        best_actions, best_reward, history = solver.solve(
            state, jax.random.PRNGKey(1), n_iters=10
        )
        assert best_actions.shape == (2, 2, 6)
        assert np.all(np.isfinite(history))
        # reward improved over the initial random actions
        assert history[-1] >= float(r0.sum(0).mean()) - 1e-6
        assert max(history) > history[0] - 1e-6

    def test_solver_nn(self, env):
        _, state = env.reset(jax.random.PRNGKey(0))
        s = SolverNN(env, horizon=2, lr=1e-3, hidden=(16,))
        params, history = s.solve(state, jax.random.PRNGKey(0), n_iters=3)
        assert len(history) == 3
        assert np.all(np.isfinite(history))

    def test_generate_experts(self, env, tmp_path):
        recs = generate_experts(
            env, str(tmp_path), n_instances=2, horizon=1, solver_iters=2,
            param_ranges={"stiffness": (500.0, 1500.0)},
        )
        assert len(recs) == 2
        assert recs[0]["action"].shape == (2, 1, 6)
        assert "stiffness" in recs[0]["params"]
        assert np.all(recs[0]["params"]["stiffness"] >= 500.0)
        import os
        assert len(os.listdir(tmp_path)) == 2


class TestParaTraining:
    def test_randomize_stiffness(self, env):
        _, state = env.reset(jax.random.PRNGKey(0))
        state2 = randomize_stiffness(state, jax.random.PRNGKey(1), 100.0, 200.0)
        s = np.asarray(state2.stiffness)
        assert s.shape == (2,)
        assert np.all((s >= 100.0) & (s <= 200.0))
        assert s[0] != s[1]  # per-env draws
