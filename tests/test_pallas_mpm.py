"""Fused Pallas MPM macro-step kernel vs the jnp oracle: forward and VJP
equivalence (interpret mode on CPU; the real-TPU path is exercised by
scripts/bench_mpm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidom_tpu.engine.mpm import (
    ELASTIC,
    VON_MISES,
    WATER,
    MPMConf,
    MPMSimulator,
)
from unidom_tpu.engine.primitives import create_primitive

B = 4


def build_pair(use_pc=True, material=ELASTIC):
    """Identically-configured (oracle, pallas) simulators + a reset state."""

    def build(backend):
        conf = MPMConf(
            n_grid=32, dt=2e-4, steps=8, E=100.0, nu=0.1, res=(16, 16, 16),
            ground_friction=0.5, backend=backend, task="test", goal_path="",
        )
        sim = MPMSimulator(conf, batch_size=B, use_position_control=use_pc)
        state = sim.add_box(
            None, size=[0.25, 0.06, 0.06], init_pos=[0.5, 0.08, 0.5],
            material=material, density=1.5,
        )
        prim = create_primitive(
            conf.steps, friction=0.2, softness=666.0, color=[0.5] * 3,
            size=[0.03, 0.03, 0.03], init_pos=[0.5, 0.06, 0.46],
        )
        state.primitives.append(prim)
        sim.register_primitive_sdf("box")
        state = sim.reset(state)
        return sim, state

    sim_x, state = build("xla")
    sim_p, _ = build("pallas")
    assert sim_p.backend == "pallas"

    key = jax.random.PRNGKey(0)
    kv, kc = jax.random.split(key)
    state = state._replace(
        v=jax.random.normal(kv, state.v.shape) * 0.2,
        C=jax.random.normal(kc, state.C.shape) * 0.5,
        yield_stress=jnp.full_like(state.yield_stress, 0.05),
    )
    return sim_x, sim_p, state


def _action():
    a = np.zeros((B, 6), np.float32)
    a[:, 0] = 0.4
    a[:, 1] = 0.2
    a[:, 2] = -0.3
    a[:, 3:] = 0.05  # small angular velocity
    return jnp.asarray(a)


@pytest.fixture(scope="module", params=["pc", "collide"])
def setup(request):
    return build_pair(use_pc=(request.param == "pc")), request.param


class TestForwardParity:
    def test_forward_matches_oracle(self, setup):
        (sim_x, sim_p, state), _ = setup
        action = _action()
        ref, _ = sim_x.step_batch(state, action)
        out, _ = sim_p.step_batch(state, action)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.C), np.asarray(ref.C),
                                   rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.J), np.asarray(ref.J),
                                   rtol=1e-3, atol=1e-5)
        for pr_o, pr_r in zip(out.primitives, ref.primitives):
            np.testing.assert_allclose(np.asarray(pr_o.position),
                                       np.asarray(pr_r.position), atol=1e-6)
            np.testing.assert_allclose(np.asarray(pr_o.rotation),
                                       np.asarray(pr_r.rotation), atol=1e-6)

    def test_two_steps_stay_consistent(self, setup):
        (sim_x, sim_p, state), _ = setup
        action = _action()
        ref, _ = sim_x.step_batch(state, action)
        ref, _ = sim_x.step_batch(ref, action)
        out, _ = sim_p.step_batch(state, action)
        out, _ = sim_p.step_batch(out, action)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-3, atol=1e-4)


def test_forward_water_and_von_mises():
    for material in (WATER, VON_MISES):
        sim_x, sim_p, state = build_pair(use_pc=False, material=material)
        action = _action()
        ref, _ = sim_x.step_batch(state, action)
        out, _ = sim_p.step_batch(state, action)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out.F), np.asarray(ref.F),
                                   rtol=1e-3, atol=1e-4)


class TestVJPParity:
    def test_grad_action_matches(self, setup):
        (sim_x, sim_p, state), _ = setup
        action = _action()

        def loss(step_fn, a):
            s, _ = step_fn(state, a)
            return (
                jnp.sum(s.x * 1.7) + jnp.sum(s.v * 0.3)
                + jnp.sum(s.primitives[0].position)
            )

        g_ref = jax.grad(lambda a: loss(sim_x.step_batch, a))(action)
        g_ker = jax.grad(lambda a: loss(sim_p.step_batch, a))(action)
        np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                   rtol=2e-3, atol=1e-5)

    def test_grad_state_and_params_match(self, setup):
        (sim_x, sim_p, state), _ = setup
        action = _action()

        def loss(step_fn, s):
            out, _ = step_fn(s, action)
            return jnp.sum(out.x * 1.3) + jnp.sum(out.v * 0.1) + jnp.sum(out.J)

        g_ref = jax.grad(lambda s: loss(sim_x.step_batch, s), allow_int=True)(state)
        g_ker = jax.grad(lambda s: loss(sim_p.step_batch, s), allow_int=True)(state)
        for field in ("x", "v", "C", "F", "J"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_ker, field)),
                np.asarray(getattr(g_ref, field)),
                rtol=3e-3, atol=5e-5, err_msg=field,
            )
        # traced material parameters (the para capability)
        for field in ("mu", "lamda", "yield_stress", "friction"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_ker, field)),
                np.asarray(getattr(g_ref, field)),
                rtol=3e-3, atol=1e-5, err_msg=field,
            )
        # primitive cotangents (position buffer + action-derived velocity)
        p_ref, p_ker = g_ref.primitives[0], g_ker.primitives[0]
        np.testing.assert_allclose(np.asarray(p_ker.position.sum(1)),
                                   np.asarray(p_ref.position.sum(1)),
                                   rtol=3e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_ker.v.sum(1)),
                                   np.asarray(p_ref.v.sum(1)),
                                   rtol=3e-3, atol=1e-5)


def test_segmented_backward_matches(monkeypatch):
    """Long-substep envs use strided checkpoints + per-segment recompute in
    the backward; force CKPT_K=3 on the steps=8 config and check the VJP
    still matches the oracle exactly (segment boundaries are invisible)."""
    import unidom_tpu.ops.pallas.mpm_kernel as mk

    monkeypatch.setattr(mk, "_ckpt_stride", lambda steps, nc, pc: 3)
    sim_x, sim_p, state = build_pair(use_pc=True)
    action = _action()

    ref, _ = sim_x.step_batch(state, action)
    out, _ = sim_p.step_batch(state, action)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-4, atol=1e-5)

    def loss(step_fn, a):
        s, _ = step_fn(state, a)
        return (
            jnp.sum(s.x * 1.7) + jnp.sum(s.v * 0.3)
            + jnp.sum(s.primitives[0].position)
        )

    g_ref = jax.grad(lambda a: loss(sim_x.step_batch, a))(action)
    g_ker = jax.grad(lambda a: loss(sim_p.step_batch, a))(action)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)

    def loss_s(step_fn, s):
        out, _ = step_fn(s, action)
        return jnp.sum(out.x * 1.3) + jnp.sum(out.v * 0.1) + jnp.sum(out.J)

    gs_ref = jax.grad(lambda s: loss_s(sim_x.step_batch, s), allow_int=True)(state)
    gs_ker = jax.grad(lambda s: loss_s(sim_p.step_batch, s), allow_int=True)(state)
    for field in ("x", "v", "C", "F", "J", "mu", "lamda"):
        np.testing.assert_allclose(
            np.asarray(getattr(gs_ker, field)),
            np.asarray(getattr(gs_ref, field)),
            rtol=3e-3, atol=5e-5, err_msg=field,
        )


def test_container_sdf_parity():
    """pour_water-class bowl collider (cut-hollow-sphere SDF): forward and
    action gradient vs the oracle."""

    def build(backend):
        conf = MPMConf(
            n_grid=32, dt=2e-4, steps=8, E=5e-4, nu=0.3, res=(16, 16, 16),
            ground_friction=0.1, backend=backend, task="test", goal_path="",
        )
        sim = MPMSimulator(conf, batch_size=B, use_position_control=False)
        state = sim.add_box(
            None, size=[0.06, 0.04, 0.06], init_pos=[0.5, 0.2, 0.5],
            material=WATER, density=1.5,
        )
        prim = create_primitive(
            conf.steps, friction=0.1, softness=666.0, color=[0.5] * 3,
            size=[0.09, 0.0, 0.008], init_pos=[0.5, 0.17, 0.5],
        )
        state.primitives.append(prim)
        sim.register_primitive_sdf("container")
        state = sim.reset(state)
        return sim, state

    sim_x, state = build("xla")
    sim_p, _ = build("pallas")
    assert sim_p.backend == "pallas"
    key = jax.random.PRNGKey(3)
    state = state._replace(v=jax.random.normal(key, state.v.shape) * 0.1)
    action = _action()

    ref, _ = sim_x.step_batch(state, action)
    out, _ = sim_p.step_batch(state, action)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                               rtol=1e-3, atol=1e-3)

    def loss(step_fn, a):
        s, _ = step_fn(state, a)
        return jnp.sum(s.x * 1.7) + jnp.sum(s.v * 0.3)

    g_ref = jax.grad(lambda a: loss(sim_x.step_batch, a))(action)
    g_ker = jax.grad(lambda a: loss(sim_p.step_batch, a))(action)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-5)
