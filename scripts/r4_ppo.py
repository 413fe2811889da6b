"""Round-4 RL-baseline training record (verdict item 7): PPO on shape_rope
for long enough to show rising eval reward, logged to
runs/r4/ppo_shape_rope/metrics.jsonl (reference dispatch:
plb/algorithms/solve.py:58-80 trains these baselines on plb tasks).

Eval = deterministic (distribution mode) rollout over env.max_steps from a
fresh reset, averaged across the batch.

    PPO_ITERS=300 PPO_NUM_ENVS=64 python scripts/r4_ppo.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unidom_tpu.algorithms.ppo import PPO
from unidom_tpu.envs.registration import env_functions
from unidom_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    iters = int(os.environ.get("PPO_ITERS", 300))
    num_envs = int(os.environ.get("PPO_NUM_ENVS", 64))
    eval_freq = int(os.environ.get("PPO_EVAL_FREQ", 10))
    out_dir = os.environ.get("PPO_OUT", "runs/r4/ppo_shape_rope")
    os.makedirs(out_dir, exist_ok=True)

    env = env_functions["shape_rope"](batch_size=num_envs, seed=0)
    env.reset(jax.random.PRNGKey(0))  # MPM envs size their obs at reset
    ppo = PPO(env, lr=3e-4, seed=0,
              entropy_floor=float(os.environ.get("PPO_ENT_FLOOR", 0.0)),
              entropy_floor_cost=float(os.environ.get("PPO_ENT_COST", 0.1)),
              min_std=float(os.environ.get("PPO_MIN_STD", 0.05)))

    @jax.jit
    def eval_rollout(policy_params, env_state):
        def body(carry, _):
            env_state = carry
            obs = env.get_obs(env_state)
            logits = ppo.policy.apply(policy_params, obs)
            act = ppo.dist.mode(logits)
            if env.action_squash == "sigmoid":
                act = jax.nn.sigmoid(act)
            _, reward, done, info = env.step_diff(act, env_state)
            return jax.lax.stop_gradient(info["state"]), reward
        _, rewards = jax.lax.scan(body, env_state, None, length=env.max_steps)
        return rewards.sum(0).mean()

    ts = ppo.init_state()
    key = jax.random.PRNGKey(1)
    _, env_state = env.reset(key)
    _, eval_state0 = env.reset(jax.random.PRNGKey(666))

    t0 = time.time()
    f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
    for it in range(iters + 1):
        if it % eval_freq == 0:
            ev = float(eval_rollout(ts.policy_params, eval_state0))
            row = {"it": it, "eval_reward": ev, "walltime": round(time.time() - t0, 1)}
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(f"it {it}: eval_reward {ev:.4f} ({time.time()-t0:.0f}s)", flush=True)
        if it == iters:
            break
        ts, env_state, metrics = ppo._train_step(ts, env_state)
        if it % eval_freq == 0:
            print(f"  train_reward {float(metrics['reward']):.4f} "
                  f"entropy {float(metrics['entropy']):.3f}", flush=True)
    f.close()


if __name__ == "__main__":
    main()
