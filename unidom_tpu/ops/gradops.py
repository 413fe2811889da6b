"""Gradient-stabilization primitives for long-horizon BPTT through physics.

These custom-VJP identities are load-bearing for APG convergence parity: the
exact placement of NaN scrubs and norm clamps inside the simulators is part
of the reference's numerical contract
(reference: DaXBench/daxbench/core/engine/mpm_simulator.py:375-411,
cloth_simulator.py:147-161,182-196, apg.py:260-267).
"""

import jax
import jax.numpy as jnp
import optax


def nan_to_num_tree(tree):
    """Scrub NaN/inf from every leaf of a pytree (forward-pass failure model)."""
    return jax.tree_util.tree_map(lambda t: jnp.nan_to_num(t), tree)


def global_norm_clip(updates, max_norm):
    """Clip a pytree of gradients to a global norm, branch-free.

    Same semantics as the reference trainer's ``clip_by_global_norm``
    (apg.py:260-267): rescale only when the norm exceeds ``max_norm``.
    """
    g_norm = optax.global_norm(updates)
    trigger = g_norm < max_norm
    return jax.tree_util.tree_map(
        lambda t: jnp.where(trigger, t, (t / g_norm) * max_norm), updates
    )


@jax.custom_vjp
def clamp_grad_norm_tree(x):
    """Identity; backward scrubs NaNs and clamps the cotangent's global norm to 1.

    Applied per-substep to the full simulator state to stop BPTT gradient
    explosion (reference ``norm_grad``/``norm_grad_state``,
    mpm_simulator.py:396-411).
    """
    return x


def _is_float(t):
    return hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.floating) and t.dtype != jax.dtypes.float0


def _map_floats(fn, tree):
    """tree_map over float leaves only; integer/key/float0 cotangents pass
    through untouched (their tangent space is trivial)."""
    return jax.tree_util.tree_map(lambda t: fn(t) if _is_float(t) else t, tree)


def _float_global_norm(tree):
    leaves = [t for t in jax.tree_util.tree_leaves(tree) if _is_float(t)]
    return optax.global_norm(leaves)


def _clamp_fwd(x):
    return x, ()


def _clamp_bwd(_, g):
    g = _map_floats(lambda t: jnp.nan_to_num(t + 0.0), g)
    g_norm = _float_global_norm(g)
    trigger = g_norm < 1.0
    g = _map_floats(lambda t: jnp.where(trigger, t, t / g_norm), g)
    return (g,)


clamp_grad_norm_tree.defvjp(_clamp_fwd, _clamp_bwd)


def _scrub_state_impl(state):
    return state._replace(
        x=jnp.nan_to_num(state.x),
        v=jnp.nan_to_num(state.v),
        C=jnp.nan_to_num(state.C),
        F=jnp.nan_to_num(state.F),
        J=jnp.nan_to_num(state.J),
    )


@jax.custom_vjp
def scrub_mpm_state(state):
    """NaN-scrub the dynamic fields of an MPM state on the forward pass AND
    clamp the cotangent norm on the backward pass (reference
    ``norm_grad_state``, mpm_simulator.py:375-394).
    """
    return _scrub_state_impl(state)


def _scrub_state_fwd(state):
    return _scrub_state_impl(state), ()


def _scrub_state_bwd(_, g):
    return _clamp_bwd((), g)


scrub_mpm_state.defvjp(_scrub_state_fwd, _scrub_state_bwd)


def normalize_grad(scale):
    """Build an identity whose backward normalizes the cotangent to unit norm,
    scrubs NaNs, then divides by ``scale`` (the cloth engine's per-array
    ``norm_grad``, cloth_simulator.py:182-196; ``scale`` = particle count).
    """

    @jax.custom_vjp
    def _norm(x):
        return x

    def _fwd(x):
        return x, ()

    def _bwd(_, g):
        g = g / jnp.linalg.norm(g)
        g = jnp.nan_to_num(g)
        g = g / scale
        return (g,)

    _norm.defvjp(_fwd, _bwd)
    return _norm


@jax.custom_vjp
def scrub_grad(x):
    """Identity; backward only replaces NaN/inf cotangents with zeros."""
    return x


def _scrub_fwd(x):
    return x, ()


def _scrub_bwd(_, g):
    return (_map_floats(lambda t: jnp.nan_to_num(t + 0.0), g),)


scrub_grad.defvjp(_scrub_fwd, _scrub_bwd)
