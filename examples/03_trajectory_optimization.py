"""Batched shooting-MPC: optimize an open-loop push sequence for shape_rope."""

import jax

import unidom_tpu
from unidom_tpu.algorithms.solver import TrajectorySolver

env = unidom_tpu.make_env("shape_rope", batch_size=4, seed=1)
_, state = env.reset(jax.random.PRNGKey(0))

solver = TrajectorySolver(env, horizon=4, lr=0.02)
actions, best_reward, history = solver.solve(
    state, jax.random.PRNGKey(1), n_iters=30, verbose=True
)
print("best reward per env:", best_reward)
