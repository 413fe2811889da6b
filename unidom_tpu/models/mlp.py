"""Policy MLP, replacing ``brax.training.networks.make_model``
(reference apg.py:353-358: layer sizes [512, 256, param_size], swish).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class PolicyMLP(nn.Module):
    layer_sizes: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, size in enumerate(self.layer_sizes):
            x = nn.Dense(size, name=f"dense_{i}")(x)
            if i < len(self.layer_sizes) - 1:
                x = nn.swish(x)
        return x


class _ModelWrapper:
    """brax-style (init, apply) pair so the trainer stays tidy."""

    def __init__(self, module: PolicyMLP, obs_size: int):
        self.module = module
        self.obs_size = obs_size

    def init(self, key):
        dummy = jnp.zeros((1, self.obs_size))
        return self.module.init(key, dummy)

    def apply(self, params, obs):
        return self.module.apply(params, obs)


def make_policy_model(param_size: int, obs_size: int, hidden=(512, 256)):
    return _ModelWrapper(PolicyMLP(tuple(hidden) + (param_size,)), obs_size)
