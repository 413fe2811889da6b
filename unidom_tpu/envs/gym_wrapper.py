"""Gym-flavoured wrapper over the batched functional envs.

Covers the reference's ``PlasticineEnv`` capabilities
(GenORM/policy/pbm/plb/envs/env.py:12-75): numpy reset/step API, episode
bookkeeping with automatic reset at max_steps, and the NaN tripwire — on a
NaN observation or reward the wrapper dumps the action history to a pickle
and raises (env.py:63-70), instead of the DaXBench-style silent scrub.
"""

import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np


class NaNError(RuntimeError):
    pass


class GymWrapper:
    def __init__(self, env, nan_fail: bool = True, dump_dir: str = "."):
        self.env = env
        self.nan_fail = nan_fail
        self.dump_dir = dump_dir
        self.batch_size = env.batch_size
        self.observation_size = env.observation_size
        self.action_size = env.action_size
        self._state = None
        self._key = jax.random.PRNGKey(0)
        self._action_history = []

    def reset(self, seed=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        obs, self._state = self.env.reset(k)
        self._action_history = []
        return np.asarray(obs)

    def step(self, actions):
        actions = jnp.asarray(actions, jnp.float32)
        self._action_history.append(np.asarray(actions))
        obs, reward, done, info = self.env.step_diff(actions, self._state)
        self._state = info["state"]

        obs_np = np.asarray(obs)
        rew_np = np.asarray(reward)
        if self.nan_fail and (not np.isfinite(obs_np).all() or not np.isfinite(rew_np).all()):
            path = f"{self.dump_dir}/nan_action_dump_{int(time.time())}.pkl"
            with open(path, "wb") as f:
                pickle.dump(self._action_history, f)
            raise NaNError(f"NaN in obs/reward; action history dumped to {path}")

        done_np = np.asarray(done)
        if done_np.all():
            obs_np = self.reset()
        return obs_np, rew_np, done_np, info
