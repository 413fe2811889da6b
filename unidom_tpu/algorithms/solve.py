"""Unified algorithm dispatcher (plb/algorithms/solve.py:36-80 parity):

    python -m unidom_tpu.algorithms.solve --algo {action,nn,ppo,sac,discor,td3,apg}
        --env_name shape_rope --horizon 6 ...

``action`` = gradient trajectory optimization, ``nn`` = policy-through-sim,
``ppo``/``sac``/``discor``/``td3`` = RL baselines, ``apg`` = the APG trainer.
"""

import argparse

import jax


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--algo", default="action",
                   choices=["action", "nn", "ppo", "sac", "discor", "td3", "apg"])
    p.add_argument("--env_name", default="shape_rope")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--horizon", type=int, default=6)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)

    from unidom_tpu.envs.registration import env_functions

    env = env_functions[a.env_name](batch_size=a.batch_size, seed=a.seed)
    if env.reset_mode in ("auto_reset", "host_reset"):
        env.reset(jax.random.PRNGKey(a.seed))

    if a.algo == "action":
        from unidom_tpu.algorithms.solver import TrajectorySolver

        _, state = env.reset(jax.random.PRNGKey(a.seed))
        solver = TrajectorySolver(env, a.horizon, lr=a.lr or 0.02)
        actions, reward, hist = solver.solve(state, n_iters=a.iters, verbose=True)
        print("final reward:", reward)
    elif a.algo == "nn":
        from unidom_tpu.algorithms.solver import SolverNN

        _, state = env.reset(jax.random.PRNGKey(a.seed))
        s = SolverNN(env, a.horizon, lr=a.lr or 1e-3)
        _, hist = s.solve(state, n_iters=a.iters, verbose=True)
        print("final reward:", hist[-1])
    elif a.algo == "ppo":
        from unidom_tpu.algorithms.ppo import PPO

        _, hist = PPO(env, lr=a.lr or 3e-4, seed=a.seed).train(a.iters, verbose=True)
        print("final reward:", hist[-1])
    elif a.algo in ("sac", "discor"):
        from unidom_tpu.algorithms.sac import SAC

        _, hist = SAC(env, lr=a.lr or 3e-4, discor=(a.algo == "discor"),
                      seed=a.seed).train(a.iters, verbose=True)
        print("final reward:", hist[-1] if hist else None)
    elif a.algo == "td3":
        from unidom_tpu.algorithms.td3 import TD3

        _, hist = TD3(env, lr=a.lr or 3e-4, seed=a.seed).train(a.iters, verbose=True)
        print("final reward:", hist[-1] if hist else None)
    elif a.algo == "apg":
        from unidom_tpu.algorithms.apg import train

        train(env_name=a.env_name, episode_length=a.horizon, num_envs=a.batch_size,
              max_it=a.iters, seed=a.seed)


if __name__ == "__main__":
    main()
