"""SAC baseline (twin soft Q, tanh-Gaussian policy, tuned entropy), JAX.

Reference capability: GenORM/policy/pbm/plb/algorithms/discor/ (torch
SAC/DisCor over the Taichi env). The DisCor error-model reweighting is
exposed via ``discor=True``: two auxiliary error networks estimate Bellman
error magnitude and importance-weight the critic targets (Kumar et al.,
NeurIPS 2020), matching the reference's discor/ package intent.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unidom_tpu.algorithms.replay import ReplayBuffer
from unidom_tpu.models.distribution import NormalTanhDistribution
from unidom_tpu.models.mlp import make_policy_model


class QNet:
    def __init__(self, obs_size, action_size, hidden=(256, 256)):
        self.model = make_policy_model(1, obs_size + action_size, hidden)

    def init(self, key):
        return self.model.init(key)

    def apply(self, params, obs, act):
        return self.model.apply(params, jnp.concatenate([obs, act], -1)).squeeze(-1)


class SACState(NamedTuple):
    policy: dict
    q1: dict
    q2: dict
    q1_target: dict
    q2_target: dict
    log_alpha: jnp.ndarray
    err1: dict
    err2: dict
    opt_state: optax.OptState
    key: jnp.ndarray


class SAC:
    def __init__(self, env, lr=3e-4, gamma=0.99, tau=5e-3, discor=False,
                 buffer_size=100_000, batch_size=256, seed=0):
        self.env = env
        self.gamma, self.tau = gamma, tau
        self.batch_size = batch_size
        self.discor = discor
        self.dist = NormalTanhDistribution(env.action_size)
        self.policy = make_policy_model(self.dist.param_size, env.observation_size)
        self.q1 = QNet(env.observation_size, env.action_size)
        self.q2 = QNet(env.observation_size, env.action_size)
        self.err1 = QNet(env.observation_size, env.action_size)
        self.err2 = QNet(env.observation_size, env.action_size)
        self.target_entropy = -env.action_size
        self.optim = optax.adam(lr)
        self.seed = seed
        self.buffer = ReplayBuffer(buffer_size, env.observation_size, env.action_size)
        self._update = jax.jit(self._build_update())

    def init_state(self):
        k = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(k, 6)
        q1 = self.q1.init(ks[1])
        q2 = self.q2.init(ks[2])
        params = dict(
            policy=self.policy.init(ks[0]), q1=q1, q2=q2,
            log_alpha=jnp.zeros(()),
            err1=self.err1.init(ks[3]), err2=self.err2.init(ks[4]),
        )
        return SACState(
            policy=params["policy"], q1=q1, q2=q2,
            q1_target=jax.tree_util.tree_map(jnp.copy, q1),
            q2_target=jax.tree_util.tree_map(jnp.copy, q2),
            log_alpha=params["log_alpha"],
            err1=params["err1"], err2=params["err2"],
            opt_state=self.optim.init(
                (params["policy"], q1, q2, params["log_alpha"],
                 params["err1"], params["err2"])
            ),
            key=ks[5],
        )

    def _build_update(self):
        def losses(params, ts: SACState, batch, key):
            pp, q1p, q2p, log_alpha, e1p, e2p = params
            obs, act, rew, nobs, done = batch
            alpha = jnp.exp(log_alpha)

            k1, k2 = jax.random.split(key)
            nlogits = self.policy.apply(pp, nobs)
            npre = self.dist.sample_no_postprocess(nlogits, k1)
            nact = jnp.tanh(npre)
            nlogp = self.dist.log_prob(nlogits, npre)
            q1_t = self.q1.apply(ts.q1_target, nobs, nact)
            q2_t = self.q2.apply(ts.q2_target, nobs, nact)
            target = rew + self.gamma * (1 - done) * (
                jnp.minimum(q1_t, q2_t) - alpha * nlogp
            )
            target = jax.lax.stop_gradient(target)

            q1_pred = self.q1.apply(q1p, obs, act)
            q2_pred = self.q2.apply(q2p, obs, act)

            if self.discor:
                # DisCor: weight targets by predicted cumulative Bellman error
                e1 = self.err1.apply(e1p, nobs, nact)
                e2 = self.err2.apply(e2p, nobs, nact)
                w1 = jax.nn.softmax(-self.gamma * jax.lax.stop_gradient(e1))
                w2 = jax.nn.softmax(-self.gamma * jax.lax.stop_gradient(e2))
                q_loss = (w1 * (q1_pred - target) ** 2).sum() * len(obs)
                q_loss = q_loss + (w2 * (q2_pred - target) ** 2).sum() * len(obs)
                q_loss = q_loss / len(obs)
                # error-model regression toward |TD error| + discounted next error
                err_t1 = jnp.abs(q1_pred - target) + self.gamma * (1 - done) * e1
                err_t2 = jnp.abs(q2_pred - target) + self.gamma * (1 - done) * e2
                e_loss = jnp.mean(
                    (self.err1.apply(e1p, obs, act) - jax.lax.stop_gradient(err_t1)) ** 2
                ) + jnp.mean(
                    (self.err2.apply(e2p, obs, act) - jax.lax.stop_gradient(err_t2)) ** 2
                )
            else:
                q_loss = jnp.mean((q1_pred - target) ** 2) + jnp.mean((q2_pred - target) ** 2)
                e_loss = 0.0

            logits = self.policy.apply(pp, obs)
            pre = self.dist.sample_no_postprocess(logits, k2)
            a = jnp.tanh(pre)
            logp = self.dist.log_prob(logits, pre)
            q_min = jnp.minimum(self.q1.apply(q1p, obs, a), self.q2.apply(q2p, obs, a))
            pi_loss = jnp.mean(alpha * logp - q_min)
            alpha_loss = -jnp.mean(
                log_alpha * jax.lax.stop_gradient(logp + self.target_entropy)
            )
            total = q_loss + pi_loss + alpha_loss + e_loss
            return total, {"q_loss": q_loss, "pi_loss": pi_loss, "alpha": alpha}

        grad_fn = jax.grad(losses, has_aux=True)

        def update(ts: SACState, batch):
            key, k = jax.random.split(ts.key)
            params = (ts.policy, ts.q1, ts.q2, ts.log_alpha, ts.err1, ts.err2)
            g, metrics = grad_fn(params, ts, batch, k)
            updates, opt_state = self.optim.update(g, ts.opt_state)
            pp, q1p, q2p, la, e1p, e2p = optax.apply_updates(params, updates)
            soft = lambda t, s: jax.tree_util.tree_map(
                lambda a, b: (1 - self.tau) * a + self.tau * b, t, s
            )
            return SACState(
                policy=pp, q1=q1p, q2=q2p,
                q1_target=soft(ts.q1_target, q1p), q2_target=soft(ts.q2_target, q2p),
                log_alpha=la, err1=e1p, err2=e2p,
                opt_state=opt_state, key=key,
            ), metrics

        return update

    def select_action(self, ts, obs, key, deterministic=False):
        logits = self.policy.apply(ts.policy, jnp.asarray(obs))
        if deterministic:
            a = self.dist.mode(logits)
        else:
            a = self.dist.sample(logits, key)
        if self.env.action_squash == "sigmoid":
            a = jax.nn.sigmoid(a)
        return np.asarray(a)

    def train(self, iterations=1000, start_steps=2, verbose=False):
        from unidom_tpu.envs.gym_wrapper import GymWrapper

        ts = self.init_state()
        wrapper = GymWrapper(self.env, nan_fail=False)
        obs = wrapper.reset(self.seed)
        rng = np.random.RandomState(self.seed)
        history = []
        for it in range(iterations):
            key = jax.random.PRNGKey(self.seed * 100003 + it)
            if it < start_steps:
                act = rng.uniform(-1, 1, (self.env.batch_size, self.env.action_size))
                if self.env.action_squash == "sigmoid":
                    act = (act + 1) / 2
            else:
                act = self.select_action(ts, obs, key)
            nobs, rew, done, _ = wrapper.step(act)
            self.buffer.add_batch(obs, act, rew, nobs, done.astype(np.float32))
            obs = nobs
            if self.buffer.size >= self.batch_size // 8:
                batch = self.buffer.sample(min(self.batch_size, self.buffer.size), rng)
                ts, metrics = self._update(ts, tuple(jnp.asarray(b) for b in batch))
                history.append(float(rew.mean()))
                if verbose and it % 50 == 0:
                    print(f"sac it {it}: r {history[-1]:.4f} alpha {float(metrics['alpha']):.3f}")
        return ts, history
