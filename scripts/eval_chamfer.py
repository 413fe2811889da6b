"""Evaluate a trained checkpoint's final-state cost (chamfer for cloth,
l2 for MPM) — the quantity the ±5% parity target compares against the
reference runs' `final_chamfer`/`final_l2` (scripts/reference_baseline_run.py).

Matches the trainer's eval protocol: eval env seed+666, fixed eval reset
key, sampled actions (reference apg.py eval), plus the deterministic-mode
rollout for reference.

Usage:
  python scripts/eval_chamfer.py --env fold_cloth1 \
      --ckpt runs/r3/fold_cloth1_4/apg_fold_cloth1_best.pkl [--num_envs 4]
"""

import argparse
import json
import pickle

import jax
import numpy as np

from unidom_tpu.algorithms.apg import build_apg
from unidom_tpu.envs.registration import env_functions
from unidom_tpu.ops.metrics import chamfer, l2_distance
from unidom_tpu.parallel.mesh import make_env_mesh


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--num_envs", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    env = env_functions[args.env](batch_size=args.num_envs, seed=args.seed + 666)
    key_eval = jax.random.PRNGKey(args.seed + 666)
    if env.reset_mode in ("auto_reset", "host_reset"):
        env.reset(key_eval)
    _, state = env.reset(key_eval)

    init_ts, _, _, run_eval = build_apg(env, episode_length=3, mesh=make_env_mesh(1))
    ts = init_ts(0)
    with open(args.ckpt, "rb") as f:
        saved = pickle.load(f)
    params = saved["policy_params"]
    norm = saved.get("normalizer_params", ts.normalizer_params)

    is_mpm = hasattr(env, "packed_x") is False and not hasattr(env, "get_x_grid")
    cost_fn = l2_distance if env.reset_mode != "reset" else chamfer

    out = {"env": args.env, "ckpt": args.ckpt, "it": saved.get("it")}
    for det in (False, True):
        end_state, _, rewards = run_eval(params, norm, state, key_eval,
                                         deterministic=det)
        mode = "det" if det else "sampled"
        out[f"test_reward_{mode}"] = float(np.asarray(rewards).sum(0).mean())
        if env.reset_mode == "auto_reset":
            # the episode auto-resets on done, so the scan's end state is a
            # fresh reset — recover the true final cost from the last
            # reward: r = e^(-10*l2)  =>  l2 = -ln(r)/10 (mpm_env.py:90-94)
            r_last = float(np.asarray(rewards)[-1].mean())
            out[f"final_cost_{mode}"] = -np.log(max(r_last, 1e-12)) / 10.0
        else:
            x = (env.packed_x(end_state) if hasattr(env, "packed_x")
                 else end_state.x)
            out[f"final_cost_{mode}"] = float(
                np.mean(np.asarray(cost_fn(x, env.goal)))
            )
    out["cost_metric"] = "l2" if env.reset_mode != "reset" else "chamfer"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
