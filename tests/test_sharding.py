"""Multi-device sharded training over the 8-device CPU mesh, cloth + MPM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from unidom_tpu.algorithms.apg import build_apg
from unidom_tpu.parallel.mesh import make_env_mesh


class TestShardedMPM:
    def test_whip_rope_sharded_minimize(self):
        """Full sharded MPM training step (the north-star '4096-env MPM
        multi-host' path, exercised at CPU-mesh scale)."""
        from unidom_tpu.engine.mpm import MPMConf
        from unidom_tpu.envs.mpm_tasks import WhipRopeEnv

        conf = MPMConf(n_grid=32, dt=2e-4, steps=6, E=100.0, nu=0.1,
                       res=(16, 16, 16), task="whip", goal_path="")
        env = WhipRopeEnv(batch_size=1, seed=1, max_steps=3, conf=conf)
        env.reset(jax.random.PRNGKey(0))

        mesh = make_env_mesh()  # 8 CPU devices
        init_ts, minimize, reset_batch, _ = build_apg(env, episode_length=2,
                                                      mesh=mesh)
        ts = init_ts(0)
        state = reset_batch(jax.random.PRNGKey(1))
        assert state.x.shape[0] == 8  # 8 devices x 1 env
        ts, metrics = minimize(ts, state)
        assert np.isfinite(float(metrics["reward"]))
        assert np.isfinite(float(metrics["grad_norm"]))

    def test_sharded_batch_lives_on_all_devices(self):
        from unidom_tpu.engine.cloth import ClothConf
        from unidom_tpu.envs.cloth_tasks import FoldCloth1Env

        conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5,
                         gripper_radius=0.08, task="t", goal_path="")
        env = FoldCloth1Env(batch_size=2, conf=conf)
        mesh = make_env_mesh()
        init_ts, minimize, reset_batch, _ = build_apg(env, 2, mesh=mesh)
        state = reset_batch(jax.random.PRNGKey(0))
        assert state.x.shape[0] == 16
        assert len(state.x.sharding.device_set) == 8


def _expected_update(env, minimize, ts, state, n_devices):
    """Recompute the sharded minimize serially on one device: per shard d,
    grad -> nan_to_num -> clip (local, as the reference does, apg.py:233-234)
    -> mean over shards (== pmean over 'env') -> adam. This is the ONLY
    property that catches a wrong in_spec / pmean silently rescaling grads."""
    import optax
    from unidom_tpu.ops.gradops import global_norm_clip

    dbg = minimize.debug
    loss_grad, optimizer = dbg["loss_grad"], dbg["optimizer"]
    clip = dbg["max_gradient_norm"]

    _, key_grad = jax.random.split(ts.key)
    per_shard = state.x.shape[0] // n_devices
    grads = []
    for d in range(n_devices):
        shard = jax.tree_util.tree_map(
            lambda x: x[d * per_shard : (d + 1) * per_shard], state
        )
        g, _ = loss_grad(ts.policy_params, ts.normalizer_params, shard, key_grad)
        g = jax.tree_util.tree_map(jnp.nan_to_num, g)
        grads.append(global_norm_clip(g, clip))
    grad = jax.tree_util.tree_map(lambda *gs: sum(gs) / len(gs), *grads)
    update, _ = optimizer.update(grad, ts.optimizer_state)
    return optax.apply_updates(ts.policy_params, update)


class TestShardingInvariance:
    """The 8-device pmean'd parameter update must equal the serially-computed
    per-shard mean: a wrong in_spec or a missing/double pmean rescales the
    gradient silently and is invisible to finiteness checks."""

    def test_cloth_grad_invariance(self):
        from unidom_tpu.engine.cloth import ClothConf
        from unidom_tpu.envs.cloth_tasks import FoldCloth1Env

        conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5,
                         gripper_radius=0.08, task="t", goal_path="")
        env = FoldCloth1Env(batch_size=1, conf=conf)
        mesh = make_env_mesh()
        n = mesh.devices.size
        init_ts, minimize, reset_batch, _ = build_apg(env, 2, mesh=mesh)
        ts = init_ts(0)
        state = reset_batch(jax.random.PRNGKey(0))

        new_ts, _ = minimize(ts, state)
        state_host = jax.device_get(state)
        expected = _expected_update(env, minimize, ts, state_host, n)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            jax.device_get(new_ts.policy_params),
            jax.device_get(expected),
        )

    def test_mpm_grad_invariance(self):
        from unidom_tpu.engine.mpm import MPMConf
        from unidom_tpu.envs.mpm_tasks import WhipRopeEnv

        conf = MPMConf(n_grid=32, dt=2e-4, steps=6, E=100.0, nu=0.1,
                       res=(16, 16, 16), task="whip", goal_path="")
        env = WhipRopeEnv(batch_size=1, seed=1, max_steps=3, conf=conf)
        env.reset(jax.random.PRNGKey(0))
        mesh = make_env_mesh()
        n = mesh.devices.size
        init_ts, minimize, reset_batch, _ = build_apg(env, 2, mesh=mesh)
        ts = init_ts(0)
        state = reset_batch(jax.random.PRNGKey(1))

        new_ts, _ = minimize(ts, state)
        state_host = jax.device_get(state)
        expected = _expected_update(env, minimize, ts, state_host, n)

        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            jax.device_get(new_ts.policy_params),
            jax.device_get(expected),
        )
