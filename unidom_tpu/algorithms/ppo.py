"""PPO baseline (clipped surrogate + GAE), pure JAX.

Reference capability: GenORM/policy/pbm/plb/algorithms/ppo/ (torch PPO over
the Taichi gym env, dispatched from plb/algorithms/solve.py:58-80). Here the
rollout runs over the batched functional env inside ``lax.scan`` and the
update is one jitted function — no replay copies through host memory.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unidom_tpu.models.distribution import NormalTanhDistribution
from unidom_tpu.models.mlp import make_policy_model


class PPOState(NamedTuple):
    policy_params: dict
    value_params: dict
    opt_state: optax.OptState
    key: jnp.ndarray


class PPO:
    """``optimizer="kfac"`` enables the ACKTR natural-gradient update
    (reference plb/algorithms/ppo/ppo/algo/{kfac,a2c_acktr}.py; see
    unidom_tpu/algorithms/kfac.py)."""

    def __init__(self, env, lr=3e-4, gamma=0.99, lam=0.95, clip_eps=0.2,
                 entropy_cost=1e-3, value_cost=0.5, unroll=None, seed=0,
                 optimizer="adam", kfac_kwargs=None,
                 entropy_floor=0.0, entropy_floor_cost=0.1,
                 min_std=0.05):
        self.env = env
        self.gamma, self.lam = gamma, lam
        self.clip_eps = clip_eps
        self.entropy_cost = entropy_cost
        self.value_cost = value_cost
        # Hinge penalty when policy entropy drops below ``entropy_floor``
        # (runs/r4/ppo_shape_rope: entropy 3.8 -> -14 collapse by it 40
        # dragged eval 4.24 -> 3.31). Inactive while entropy stays healthy.
        self.entropy_floor = entropy_floor
        self.entropy_floor_cost = entropy_floor_cost
        self.unroll = unroll or env.max_steps

        # min_std floors the policy scale STRUCTURALLY: the r5 records show
        # the entropy hinge alone slows but does not stop std collapse on
        # shape_rope (runs/r5/ppo_shape_rope{,_v2}: entropy -> -17..-27).
        # APG keeps the reference's 0.001 (its BPTT gradients need the
        # near-deterministic limit); PPO's surrogate does not.
        self.dist = NormalTanhDistribution(env.action_size, min_std=min_std)
        self.policy = make_policy_model(self.dist.param_size, env.observation_size,
                                        hidden=(256, 256))
        self.value = make_policy_model(1, env.observation_size, hidden=(256, 256))
        self.optimizer = optimizer
        if optimizer == "kfac":
            from unidom_tpu.algorithms.kfac import KFAC

            self.kfac = KFAC(**(kfac_kwargs or {}))
        else:
            self.optim = optax.adam(lr)
        self.seed = seed
        self._train_step = jax.jit(self._build_train_step())

    def init_state(self):
        k = jax.random.PRNGKey(self.seed)
        k, kp, kv = jax.random.split(k, 3)
        pp, vp = self.policy.init(kp), self.value.init(kv)
        if self.optimizer == "kfac":
            opt_state = self.kfac.init({"policy": pp, "value": vp})
        else:
            opt_state = self.optim.init((pp, vp))
        return PPOState(pp, vp, opt_state, k)

    # ---------------- rollout ---------------- #

    def _rollout(self, ts: PPOState, env_state, key):
        def body(carry, _):
            env_state, key = carry
            key, k = jax.random.split(key)
            obs = self.env.get_obs(env_state)
            logits = self.policy.apply(ts.policy_params, obs)
            pre = self.dist.sample_no_postprocess(logits, k)
            act = jnp.tanh(pre)
            if self.env.action_squash == "sigmoid":
                act_env = jax.nn.sigmoid(act)
            else:
                act_env = act
            logp = self.dist.log_prob(logits, pre)
            value = self.value.apply(ts.value_params, obs).squeeze(-1)
            _, reward, done, info = self.env.step_diff(act_env, env_state)
            nstate = jax.lax.stop_gradient(info["state"])
            out = (obs, pre, logp, value, reward, done.astype(jnp.float32))
            return (nstate, key), out

        (env_state, _), traj = jax.lax.scan(
            body, (env_state, key), None, length=self.unroll
        )
        return env_state, traj

    def _gae(self, values, rewards, dones, last_value):
        def body(carry, t):
            gae = carry
            nxt = jnp.where(t == self.unroll - 1, last_value, values_pad[t + 1])
            delta = rewards[t] + self.gamma * nxt * (1 - dones[t]) - values_pad[t]
            gae = delta + self.gamma * self.lam * (1 - dones[t]) * gae
            return gae, gae

        values_pad = jnp.concatenate([values, last_value[None]], 0)
        _, adv_rev = jax.lax.scan(
            body, jnp.zeros_like(last_value), jnp.arange(self.unroll - 1, -1, -1)
        )
        adv = adv_rev[::-1]
        return adv, adv + values

    # ---------------- update ---------------- #

    def _build_train_step(self):
        def loss_fn(params, obs, pre_actions, old_logp, adv, returns):
            pp, vp = params
            logits = self.policy.apply(pp, obs)
            logp = self.dist.log_prob(logits, pre_actions)
            ratio = jnp.exp(logp - old_logp)
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
            surrogate = jnp.minimum(
                ratio * adv_n,
                jnp.clip(ratio, 1 - self.clip_eps, 1 + self.clip_eps) * adv_n,
            )
            v = self.value.apply(vp, obs).squeeze(-1)
            v_loss = jnp.mean((v - returns) ** 2)
            ent = -jnp.mean(logp)
            ent_hinge = self.entropy_floor_cost * jax.nn.relu(
                self.entropy_floor - ent
            )
            return (-jnp.mean(surrogate) + self.value_cost * v_loss
                    - self.entropy_cost * ent + ent_hinge), (v_loss, ent)

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def train_step(ts: PPOState, env_state):
            key, k_roll = jax.random.split(ts.key)
            env_state, (obs, pre, logp, values, rewards, dones) = self._rollout(
                ts, env_state, k_roll
            )
            last_obs = self.env.get_obs(env_state)
            last_v = self.value.apply(ts.value_params, last_obs).squeeze(-1)
            adv, returns = self._gae(values, rewards, dones, last_v)

            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            g, (v_loss, ent) = grad_fn(
                (ts.policy_params, ts.value_params),
                flat(obs), flat(pre), flat(logp), flat(adv), flat(returns),
            )
            if self.optimizer == "kfac":
                # ACKTR Fisher losses (a2c_acktr.py:53-66): policy = mean
                # log-prob of the taken actions; value = MSE against the
                # current value + unit gaussian noise.
                obs_f, pre_f = flat(obs), flat(pre)
                key, k_noise = jax.random.split(key)
                v_now = jax.lax.stop_gradient(
                    self.value.apply(ts.value_params, obs_f).squeeze(-1)
                )
                v_target = v_now + jax.random.normal(k_noise, v_now.shape)
                stat_inputs = {
                    "policy": (obs_f, lambda lg: -self.dist.log_prob(lg, pre_f).mean()),
                    "value": (obs_f, lambda v: -((v.squeeze(-1) - v_target) ** 2).mean()),
                }
                gp, gv = g
                params, opt_state = self.kfac.update(
                    ts.opt_state,
                    {"policy": ts.policy_params, "value": ts.value_params},
                    {"policy": gp, "value": gv},
                    stat_inputs,
                )
                pp, vp = params["policy"], params["value"]
            else:
                updates, opt_state = self.optim.update(g, ts.opt_state)
                pp, vp = optax.apply_updates((ts.policy_params, ts.value_params), updates)
            metrics = {"reward": rewards.sum(0).mean(), "v_loss": v_loss, "entropy": ent}
            return PPOState(pp, vp, opt_state, key), env_state, metrics

        return train_step

    def train(self, iterations=100, verbose=False):
        ts = self.init_state()
        key = jax.random.PRNGKey(self.seed + 1)
        _, env_state = self.env.reset(key)
        history = []
        for it in range(iterations):
            ts, env_state, metrics = self._train_step(ts, env_state)
            history.append(float(metrics["reward"]))
            if verbose and it % 10 == 0:
                print(f"ppo it {it}: reward {history[-1]:.4f}")
        return ts, history
