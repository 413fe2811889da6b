"""RL baselines (PPO/SAC/TD3) + gym wrapper smoke tests on a tiny env."""

import jax
import numpy as np
import pytest

from unidom_tpu.engine.cloth import ClothConf
from unidom_tpu.envs.cloth_tasks import FoldCloth1Env
from unidom_tpu.envs.gym_wrapper import GymWrapper


@pytest.fixture(scope="module")
def env():
    conf = ClothConf(N=20, mem_saving_level=1, n_substeps=5, gripper_radius=0.08,
                     task="t", goal_path="")
    return FoldCloth1Env(batch_size=2, conf=conf, aux_reward=True)


class TestGymWrapper:
    def test_reset_step_loop(self, env):
        w = GymWrapper(env)
        obs = w.reset(seed=0)
        assert obs.shape == (2, env.observation_size)
        for _ in range(4):  # max_steps=3 -> auto-resets inside
            a = np.random.uniform(0, 1, (2, 6)).astype(np.float32)
            obs, rew, done, info = w.step(a)
        assert obs.shape == (2, env.observation_size)
        assert np.isfinite(rew).all()


class TestPPO:
    def test_train_steps(self, env):
        from unidom_tpu.algorithms.ppo import PPO

        ppo = PPO(env, unroll=2, seed=0)
        ts, hist = ppo.train(iterations=2)
        assert len(hist) == 2
        assert all(np.isfinite(h) for h in hist)


class TestSAC:
    @pytest.mark.parametrize("discor", [False, True])
    def test_train_steps(self, env, discor):
        from unidom_tpu.algorithms.sac import SAC

        sac = SAC(env, batch_size=16, discor=discor, seed=0)
        ts, hist = sac.train(iterations=4, start_steps=1)
        assert len(hist) >= 2
        assert all(np.isfinite(h) for h in hist)
        assert np.isfinite(float(ts.log_alpha))


class TestTD3:
    def test_train_steps(self, env):
        from unidom_tpu.algorithms.td3 import TD3

        td3 = TD3(env, batch_size=16, seed=0)
        ts, hist = td3.train(iterations=4, start_steps=1)
        assert len(hist) >= 2
        assert all(np.isfinite(h) for h in hist)
        assert int(ts.it) >= 2


class TestKFAC:
    def test_ppo_kfac_train_steps(self, env):
        """ACKTR natural-gradient PPO (reference kfac.py:87-243)."""
        from unidom_tpu.algorithms.ppo import PPO

        ppo = PPO(env, unroll=2, seed=0, optimizer="kfac",
                  kfac_kwargs={"lr": 0.05, "kl_clip": 1e-3, "Tf": 2})
        ts, hist = ppo.train(iterations=3)
        assert len(hist) == 3
        assert all(np.isfinite(h) for h in hist)
        # params must move and stay finite
        leaves = jax.tree_util.tree_leaves(ts.policy_params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_preconditioner_matches_dense_fisher_inverse(self):
        """On a single linear layer with stationary stats, the K-FAC update
        must equal (G (x) A + damping)^-1-preconditioned gradient, i.e.
        Q_g ((Q_g^T dW Q_a) / (d_g d_a^T + la)) Q_a^T."""
        from unidom_tpu.algorithms.kfac import KFAC

        key = jax.random.PRNGKey(0)
        din, dout, B = 5, 3, 64
        import jax.numpy as jnp
        params = {"params": {"dense_0": {
            "kernel": jax.random.normal(key, (din, dout)) * 0.1,
            "bias": jnp.zeros((dout,)),
        }}}
        x = jax.random.normal(jax.random.PRNGKey(1), (B, din))
        g = {"params": {"dense_0": {
            "kernel": jax.random.normal(jax.random.PRNGKey(2), (din, dout)),
            "bias": jax.random.normal(jax.random.PRNGKey(3), (dout,)),
        }}}

        kf = KFAC(lr=1.0, momentum=0.0, kl_clip=1e12, damping=1e-2, Tf=1)
        st = kf.init({"net": params})
        fisher = lambda lg: (lg * jax.random.normal(jax.random.PRNGKey(4), (B, dout))).mean()
        st = kf._update_stats(st, {"net": params}, {"net": (x, fisher)})
        st = kf._update_eigs(st)
        out = kf._precondition(st, {"net": g})

        ls = st.layers["net"][0]
        A = np.asarray(ls.m_aa)
        G = np.asarray(ls.m_gg)
        la = 1e-2
        gw = np.asarray(g["params"]["dense_0"]["kernel"]).T  # (out, in)
        da, qa = np.linalg.eigh(A)
        dg, qg = np.linalg.eigh(G)
        da, dg = da * (da > 1e-6), dg * (dg > 1e-6)
        v = qg @ ((qg.T @ gw @ qa) / (dg[:, None] * da[None, :] + la)) @ qa.T
        np.testing.assert_allclose(
            np.asarray(out["net"]["params"]["dense_0"]["kernel"]), v.T,
            rtol=1e-4, atol=1e-5,
        )
