"""Tanh-squashed diagonal Gaussian action distribution.

Replaces the brax 0.0.13 ``distribution.NormalTanhDistribution`` dependency
(used by the reference trainer, apg.py:98-99) with a self-contained
implementation: logits = [loc, scale_raw], scale = softplus(scale_raw) +
min_std, sample = tanh(loc + scale * eps).
"""

import jax
import jax.numpy as jnp


class NormalTanhDistribution:
    def __init__(self, event_size: int, min_std: float = 0.001):
        self.event_size = event_size
        self.min_std = min_std

    @property
    def param_size(self) -> int:
        return 2 * self.event_size

    def _loc_scale(self, logits):
        loc, scale_raw = jnp.split(logits, 2, axis=-1)
        scale = jax.nn.softplus(scale_raw) + self.min_std
        return loc, scale

    def sample_no_postprocess(self, logits, key):
        loc, scale = self._loc_scale(logits)
        return loc + scale * jax.random.normal(key, loc.shape)

    def sample(self, logits, key):
        return jnp.tanh(self.sample_no_postprocess(logits, key))

    def mode(self, logits):
        loc, _ = self._loc_scale(logits)
        return jnp.tanh(loc)

    def log_prob(self, logits, pre_tanh_actions):
        """Log-density of the tanh-squashed sample, evaluated from the
        pre-squash value (numerically stable change of variables)."""
        loc, scale = self._loc_scale(logits)
        log_unnormalized = -0.5 * jnp.square((pre_tanh_actions - loc) / scale)
        log_normalization = 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
        log_det_jacobian = 2.0 * (
            jnp.log(2.0) - pre_tanh_actions - jax.nn.softplus(-2.0 * pre_tanh_actions)
        )
        return jnp.sum(log_unnormalized - log_normalization - log_det_jacobian, axis=-1)

    def entropy(self, logits, key):
        """Sampled entropy estimate (matches brax's stochastic entropy)."""
        loc, scale = self._loc_scale(logits)
        pre = loc + scale * jax.random.normal(key, loc.shape)
        log_det = 2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))
        base_entropy = 0.5 * jnp.log(2.0 * jnp.pi * jnp.e) + jnp.log(scale)
        return jnp.sum(base_entropy + log_det, axis=-1)
