"""B=16 fault bisect, level 2: single-call grad passes all arms
(runs/r5/b16_bisect.jsonl) but the full training iteration still faults —
bisect the CHAIN LENGTH: grad through a lax.scan of K kernel macro calls.

    B=16 K=5 python scripts/r5_b16_chain.py
Prints one JSON line {B, K, ok, error}.
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
    K = int(os.environ.get("K", 5))
    remat = os.environ.get("REMAT", "")
    if remat in ("0", "1"):
        os.environ["UNIDOM_BIG_REMAT"] = remat
    case = dict(B=B, K=K, remat=remat or "default")
    try:
        env = env_functions["shape_elasto_plastic"](batch_size=B, seed=0)
        _, state = env.reset(jax.random.PRNGKey(0))
        sim = env.simulator
        a = jnp.full((B, 6 * len(state.primitives)), 0.02, jnp.float32)

        def loss(a, state):
            def body(s, _):
                s2, _ = sim.step_batch(s, a)
                return s2, ()
            s, _ = jax.lax.scan(body, state, None, length=K)
            return s.x.sum()

        g = jax.jit(jax.grad(loss))(a, state)
        jax.block_until_ready(g)
        ok = bool(jnp.isfinite(jnp.asarray(g)).all())
        print(json.dumps({**case, "ok": ok, "error": None}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({**case, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
