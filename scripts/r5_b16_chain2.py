"""B=16 fault bisect, level 3: the K<=20 plain sim.step_batch chains pass
(runs/r5/b16_chain.jsonl) but the full training iteration faults — close
the remaining gap in three arms:

    MODE=k60   — plain sim.step_batch chain at the full per-iter depth (60)
    MODE=env   — grad through env.step_diff x ep_len (obs/reward/focus path)
    MODE=mini  — the exact bench path (build_apg minimize, one iteration)

    B=16 MODE=env python scripts/r5_b16_chain2.py
Prints one JSON line {B, mode, ok, error}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unidom_tpu.envs.registration import env_functions
from unidom_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    B = int(os.environ.get("B", 16))
    mode = os.environ.get("MODE", "k60")
    ep_len = int(os.environ.get("EP_LEN", 3))
    case = dict(B=B, mode=mode)
    try:
        env = env_functions["shape_elasto_plastic"](batch_size=B, seed=0)
        obs, state = env.reset(jax.random.PRNGKey(0))

        if mode == "k60":
            sim = env.simulator
            a = jnp.full((B, 6 * len(state.primitives)), 0.02, jnp.float32)

            def loss(a, state):
                def body(s, _):
                    s2, _ = sim.step_batch(s, a)
                    return s2, ()
                s, _ = jax.lax.scan(body, state, None, length=60)
                return s.x.sum()

            g = jax.jit(jax.grad(loss))(a, state)
        elif mode == "env":
            def loss(a, state):
                def body(s, _):
                    _, r, _, info = env.step_diff(a, s)
                    return info["state"], r
                s, rs = jax.lax.scan(body, state, None, length=ep_len)
                return -jnp.sum(rs)

            a = jnp.zeros((B, env.action_size), jnp.float32)
            g = jax.jit(jax.grad(loss))(a, state)
        elif mode == "mini":
            from unidom_tpu.algorithms.apg import build_apg
            from unidom_tpu.parallel.mesh import make_env_mesh

            mesh = make_env_mesh()
            init_ts, minimize, reset_batch, _ = build_apg(
                env, episode_length=ep_len, learning_rate=1e-4,
                max_gradient_norm=0.3, mesh=mesh,
            )
            ts = init_ts(0)
            state = reset_batch(jax.random.PRNGKey(0))
            ts, metrics = minimize(ts, state)
            g = metrics
        else:
            raise ValueError(mode)
        jax.block_until_ready(g)
        leaves = jax.tree_util.tree_leaves(g)
        ok = all(bool(jnp.isfinite(jnp.asarray(l)).all()) for l in leaves
                 if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating))
        print(json.dumps({**case, "ok": ok, "error": None}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({**case, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
