"""RL baselines (PPO/SAC/TD3) + gym wrapper smoke tests on a tiny env."""

import jax
import numpy as np
import pytest

from unidom_tpu.engine.cloth import ClothConf
from unidom_tpu.envs.cloth_tasks import FoldCloth1Env
from unidom_tpu.envs.gym_wrapper import GymWrapper


@pytest.fixture(scope="module")
def env():
    conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5, gripper_radius=0.08,
                     task="t", goal_path="")
    return FoldCloth1Env(batch_size=2, conf=conf, aux_reward=True)


class TestGymWrapper:
    def test_reset_step_loop(self, env):
        w = GymWrapper(env)
        obs = w.reset(seed=0)
        assert obs.shape == (2, env.observation_size)
        for _ in range(4):  # max_steps=3 -> auto-resets inside
            a = np.random.uniform(0, 1, (2, 6)).astype(np.float32)
            obs, rew, done, info = w.step(a)
        assert obs.shape == (2, env.observation_size)
        assert np.isfinite(rew).all()


class TestPPO:
    def test_train_steps(self, env):
        from unidom_tpu.algorithms.ppo import PPO

        ppo = PPO(env, unroll=2, seed=0)
        ts, hist = ppo.train(iterations=2)
        assert len(hist) == 2
        assert all(np.isfinite(h) for h in hist)


class TestSAC:
    @pytest.mark.parametrize("discor", [False, True])
    def test_train_steps(self, env, discor):
        from unidom_tpu.algorithms.sac import SAC

        sac = SAC(env, batch_size=16, discor=discor, seed=0)
        ts, hist = sac.train(iterations=4, start_steps=1)
        assert len(hist) >= 2
        assert all(np.isfinite(h) for h in hist)
        assert np.isfinite(float(ts.log_alpha))


class TestTD3:
    def test_train_steps(self, env):
        from unidom_tpu.algorithms.td3 import TD3

        td3 = TD3(env, batch_size=16, seed=0)
        ts, hist = td3.train(iterations=4, start_steps=1)
        assert len(hist) >= 2
        assert all(np.isfinite(h) for h in hist)
        assert int(ts.it) >= 2
