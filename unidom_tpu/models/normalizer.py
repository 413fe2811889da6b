"""Running observation normalizer.

Replaces ``brax.training.normalization`` (reference apg.py:111-120). State is
a (count, mean, m2) triple; updates are Welford-style and, under a device
mesh, the batch moments are psum-reduced over the ``env`` axis so every
replica holds identical statistics (the brax ``pmap_to_devices`` contract).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NormalizerParams(NamedTuple):
    count: jnp.ndarray  # ()
    mean: jnp.ndarray  # (obs_size,)
    m2: jnp.ndarray  # (obs_size,) sum of squared deviations


def create_observation_normalizer(obs_size: int) -> NormalizerParams:
    return NormalizerParams(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros((obs_size,), jnp.float32),
        m2=jnp.ones((obs_size,), jnp.float32),
    )


def update_normalizer(
    params: NormalizerParams, obs: jnp.ndarray, axis_name: Optional[str] = None
) -> NormalizerParams:
    """obs: (..., obs_size); leading axes are flattened into the batch."""
    flat = obs.reshape(-1, obs.shape[-1])
    batch_count = jnp.asarray(flat.shape[0], jnp.float32)
    batch_mean = flat.mean(0)
    if axis_name is not None:
        # shard_map shards are equal-sized, so pmean of per-device means IS
        # the global batch mean; m2 must then be accumulated against that
        # global mean (not per-device means) or the between-device variance
        # term sum_d count_d*(mean_d - mean)^2 is silently dropped.
        n_dev = jax.lax.psum(1, axis_name)
        batch_count = batch_count * n_dev
        batch_mean = jax.lax.pmean(batch_mean, axis_name)
        batch_m2 = jax.lax.psum(((flat - batch_mean) ** 2).sum(0), axis_name)
    else:
        batch_m2 = ((flat - batch_mean) ** 2).sum(0)

    delta = batch_mean - params.mean
    total = params.count + batch_count
    new_mean = params.mean + delta * batch_count / total
    new_m2 = params.m2 + batch_m2 + delta**2 * params.count * batch_count / total
    return NormalizerParams(count=total, mean=new_mean, m2=new_m2)


def normalize(params: NormalizerParams, obs: jnp.ndarray) -> jnp.ndarray:
    var = params.m2 / jnp.maximum(params.count, 1.0)
    return (obs - params.mean) / jnp.sqrt(var + 1e-8)
