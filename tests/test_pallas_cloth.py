"""Pallas cloth kernel vs the jnp oracle: forward and VJP equivalence
(interpret mode on CPU; the real-TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidom_tpu.engine.cloth import ClothConf, ClothSimulator
from unidom_tpu.ops.pallas.cloth_kernel import build_cloth_robot_step_kernel


def identity_collision(x, v, idx_i, idx_j):
    return v


@pytest.fixture(scope="module")
def setup():
    conf = ClothConf(N=20, stiffness=900.0, mem_saving_level=0, n_substeps=10,
                     gripper_radius=0.08)
    mask = np.zeros((20, 20), np.float32)
    mask[8:12, 6:14] = 1.0  # 4 x 8 cloth
    sim = ClothSimulator(conf, batch_size=8, collision_func=identity_collision,
                         cloth_mask=mask)
    state = sim.reset()
    # perturb so springs/friction are active; gripper on the cloth
    key = jax.random.PRNGKey(0)
    state = state._replace(
        v=jax.random.normal(key, state.v.shape) * 0.3,
        primitive0=jnp.broadcast_to(
            jnp.concatenate([state.x[0, 0, 0], jnp.array([0.08])]), (8, 4)
        ),
    )
    kernel_step = build_cloth_robot_step_kernel(sim, interpret=True)
    return sim, state, kernel_step


ACTION = None


def _action():
    a = np.zeros((8, 8), np.float32)
    a[:, 0] = 0.8
    a[:, 1] = 1.5
    a[:, 3] = 0.0  # suction engaged
    a[:, 4:7] = 0.1
    return jnp.asarray(a)


class TestForwardParity:
    def test_forward_matches_oracle(self, setup):
        sim, state, kernel_step = setup
        action = _action()
        ref, _ = sim.step_batch(state, action)
        out, out2 = kernel_step(state, action)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.primitive0),
                                   np.asarray(ref.primitive0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.primitive1),
                                   np.asarray(ref.primitive1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.action0),
                                   np.asarray(ref.action0), atol=1e-7)

    @pytest.mark.parametrize("B", [1, 2, 5])
    def test_small_batch_padding(self, setup, B):
        """Batches below/off BLOCK_ENVS must tile-pad to a full block: a
        short fill (old `t[:pad]` with pad > B) left a zero pallas grid and
        uninitialized outputs (regression: fold_cloth1 eval NaN at
        num_eval_envs=2 on TPU)."""
        sim, state, kernel_step = setup
        sub = jax.tree_util.tree_map(lambda t: t[:B], state)
        action = _action()[:B]
        ref, _ = sim.step_batch(sub, action)
        out, _ = kernel_step(sub, action)
        assert out.x.shape[0] == B
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                                   rtol=1e-4, atol=1e-4)
        # gradients flow only through the real rows
        g = jax.grad(lambda s, a: kernel_step(s, a)[0].x.sum(), argnums=1)(
            sub, action)
        assert g.shape[0] == B
        assert np.all(np.isfinite(np.asarray(g)))

    def test_two_steps_stay_consistent(self, setup):
        sim, state, kernel_step = setup
        action = _action()
        ref, _ = sim.step_batch(state, action)
        ref, _ = sim.step_batch(ref, action)
        out, _ = kernel_step(state, action)
        out, _ = kernel_step(out, action)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                                   rtol=1e-4, atol=1e-4)


class TestVJPParity:
    @pytest.mark.parametrize("wrt", ["action", "state"])
    def test_grad_matches_oracle(self, setup, wrt):
        sim, state, kernel_step = setup
        action = _action()

        def loss_ref(action, state):
            s, _ = sim.step_batch(state, action)
            return jnp.sum(s.x * 1.7) + jnp.sum(s.v * 0.3) + jnp.sum(s.primitive0)

        def loss_ker(action, state):
            s, _ = kernel_step(state, action)
            return jnp.sum(s.x * 1.7) + jnp.sum(s.v * 0.3) + jnp.sum(s.primitive0)

        if wrt == "action":
            g_ref = jax.grad(loss_ref)(action, state)
            g_ker = jax.grad(loss_ker)(action, state)
            np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                       rtol=2e-3, atol=1e-6)
        else:
            g_ref = jax.grad(lambda s: loss_ref(action, s._replace()), allow_int=True)(state)
            g_ker = jax.grad(lambda s: loss_ker(action, s._replace()), allow_int=True)(state)
            np.testing.assert_allclose(np.asarray(g_ker.x), np.asarray(g_ref.x),
                                       rtol=2e-3, atol=1e-6)
            np.testing.assert_allclose(np.asarray(g_ker.v), np.asarray(g_ref.v),
                                       rtol=2e-3, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(g_ker.stiffness), np.asarray(g_ref.stiffness),
                rtol=2e-3, atol=1e-7,
            )
            np.testing.assert_allclose(
                np.asarray(g_ker.mu), np.asarray(g_ref.mu), rtol=2e-3, atol=1e-7
            )
