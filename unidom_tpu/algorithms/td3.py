"""TD3 baseline (twin delayed DDPG), JAX.

Reference capability: GenORM/policy/pbm/plb/algorithms/TD3/ (torch TD3 over
the Taichi env, dispatched from plb/algorithms/solve.py).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unidom_tpu.algorithms.replay import ReplayBuffer
from unidom_tpu.algorithms.sac import QNet
from unidom_tpu.models.mlp import make_policy_model


class TD3State(NamedTuple):
    policy: dict
    policy_target: dict
    q1: dict
    q2: dict
    q1_target: dict
    q2_target: dict
    opt_state: optax.OptState
    it: jnp.ndarray
    key: jnp.ndarray


class TD3:
    def __init__(self, env, lr=3e-4, gamma=0.99, tau=5e-3, policy_noise=0.2,
                 noise_clip=0.5, policy_delay=2, expl_noise=0.1,
                 buffer_size=100_000, batch_size=256, seed=0):
        self.env = env
        self.gamma, self.tau = gamma, tau
        self.policy_noise, self.noise_clip = policy_noise, noise_clip
        self.policy_delay = policy_delay
        self.expl_noise = expl_noise
        self.batch_size = batch_size
        self.policy = make_policy_model(env.action_size, env.observation_size)
        self.q1 = QNet(env.observation_size, env.action_size)
        self.q2 = QNet(env.observation_size, env.action_size)
        self.optim = optax.adam(lr)
        self.seed = seed
        self.buffer = ReplayBuffer(buffer_size, env.observation_size, env.action_size)
        self._update = jax.jit(self._build_update())

    def init_state(self):
        ks = jax.random.split(jax.random.PRNGKey(self.seed), 4)
        pp = self.policy.init(ks[0])
        q1, q2 = self.q1.init(ks[1]), self.q2.init(ks[2])
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        return TD3State(
            policy=pp, policy_target=copy(pp), q1=q1, q2=q2,
            q1_target=copy(q1), q2_target=copy(q2),
            opt_state=self.optim.init((pp, q1, q2)),
            it=jnp.zeros((), jnp.int32), key=ks[3],
        )

    def _act(self, params, obs):
        return jnp.tanh(self.policy.apply(params, obs))

    def _build_update(self):
        def critic_loss(params, ts, batch, key):
            pp, q1p, q2p = params
            obs, act, rew, nobs, done = batch
            noise = jnp.clip(
                jax.random.normal(key, act.shape) * self.policy_noise,
                -self.noise_clip, self.noise_clip,
            )
            nact = jnp.clip(self._act(ts.policy_target, nobs) + noise, -1.0, 1.0)
            t1 = self.q1.apply(ts.q1_target, nobs, nact)
            t2 = self.q2.apply(ts.q2_target, nobs, nact)
            target = rew + self.gamma * (1 - done) * jnp.minimum(t1, t2)
            target = jax.lax.stop_gradient(target)
            ql = jnp.mean((self.q1.apply(q1p, obs, act) - target) ** 2)
            ql = ql + jnp.mean((self.q2.apply(q2p, obs, act) - target) ** 2)
            # actor loss (masked by delay outside via where)
            pi = self._act(pp, obs)
            pl = -jnp.mean(self.q1.apply(q1p, obs, pi))
            return ql, pl

        def total_loss(params, ts, batch, key, do_actor):
            ql, pl = critic_loss(params, ts, batch, key)
            return ql + do_actor * pl

        grad_fn = jax.grad(total_loss)

        def update(ts: TD3State, batch):
            key, k = jax.random.split(ts.key)
            do_actor = (ts.it % self.policy_delay == 0).astype(jnp.float32)
            params = (ts.policy, ts.q1, ts.q2)
            g = grad_fn(params, ts, batch, k, do_actor)
            updates, opt_state = self.optim.update(g, ts.opt_state)
            pp, q1p, q2p = optax.apply_updates(params, updates)
            soft = lambda t, s: jax.tree_util.tree_map(
                lambda a, b: (1 - self.tau) * a + self.tau * b, t, s
            )
            # target nets track only on actor steps (standard TD3)
            maybe = lambda t, s: jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_actor > 0, b, a), t, s
            )
            return TD3State(
                policy=pp,
                policy_target=maybe(ts.policy_target, soft(ts.policy_target, pp)),
                q1=q1p, q2=q2p,
                q1_target=maybe(ts.q1_target, soft(ts.q1_target, q1p)),
                q2_target=maybe(ts.q2_target, soft(ts.q2_target, q2p)),
                opt_state=opt_state, it=ts.it + 1, key=key,
            )

        return update

    def select_action(self, ts, obs, rng, explore=True):
        a = np.asarray(self._act(ts.policy, jnp.asarray(obs)))
        if explore:
            a = np.clip(a + rng.normal(0, self.expl_noise, a.shape), -1, 1)
        if self.env.action_squash == "sigmoid":
            a = (a + 1) / 2
        return a

    def train(self, iterations=1000, start_steps=2, verbose=False):
        from unidom_tpu.envs.gym_wrapper import GymWrapper

        ts = self.init_state()
        wrapper = GymWrapper(self.env, nan_fail=False)
        obs = wrapper.reset(self.seed)
        rng = np.random.RandomState(self.seed)
        history = []
        for it in range(iterations):
            if it < start_steps:
                act = rng.uniform(-1, 1, (self.env.batch_size, self.env.action_size))
                if self.env.action_squash == "sigmoid":
                    act = (act + 1) / 2
            else:
                act = self.select_action(ts, obs, rng)
            nobs, rew, done, _ = wrapper.step(act)
            self.buffer.add_batch(obs, act, rew, nobs, done.astype(np.float32))
            obs = nobs
            if self.buffer.size >= self.batch_size // 8:
                batch = self.buffer.sample(min(self.batch_size, self.buffer.size), rng)
                ts = self._update(ts, tuple(jnp.asarray(b) for b in batch))
                history.append(float(rew.mean()))
                if verbose and it % 50 == 0:
                    print(f"td3 it {it}: r {history[-1]:.4f}")
        return ts, history
