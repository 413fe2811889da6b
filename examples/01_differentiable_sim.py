"""Differentiate through the cloth simulator (the canonical library flow)."""

import jax
import jax.numpy as jnp

import unidom_tpu

env = unidom_tpu.make_env("fold_cloth1", batch_size=2, seed=1)
obs, state = env.reset(jax.random.PRNGKey(1))
print("obs:", obs.shape, "particles:", env.n_particles)

actions = env.get_random_fold_action(state)
obs, reward, done, info = env.step_diff(actions, state)
print("reward:", reward)


def objective(actions, state):
    _, reward, _, _ = env.step_diff(actions, state)
    return -reward.mean()


grad = jax.jit(jax.grad(objective))(actions, state)
print("d(reward)/d(action):", grad)
