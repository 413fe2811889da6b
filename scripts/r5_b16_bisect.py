"""Round-5 verdict item 2: bisect the shape_elasto_plastic B=16 TPU device
fault (runs/r4/bench_shape_elasto_b16_fault.log; reproduced on the round-5
kernel, runs/r5/bench_shape_elasto_b16.log).

One (B, stage, remat) case per invocation — a device fault can poison the
backend for the rest of the process, so the driver shell script runs each
case in a fresh interpreter:

    B=8 STAGE=fwd REMAT=default python scripts/r5_b16_bisect.py
    STAGE in {fwd, grad}; REMAT in {default, 0, 1}.

Prints one JSON line {case, ok, error}.
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
    stage = os.environ.get("STAGE", "fwd")
    remat = os.environ.get("REMAT", "default")
    if remat in ("0", "1"):
        os.environ["UNIDOM_BIG_REMAT"] = remat
    case = dict(B=B, stage=stage, remat=remat)
    try:
        env = env_functions["shape_elasto_plastic"](batch_size=B, seed=0)
        _, state = env.reset(jax.random.PRNGKey(0))
        sim = env.simulator
        a = jnp.full((B, 6 * len(state.primitives)), 0.02, jnp.float32)
        if stage == "fwd":
            out = jax.jit(lambda s, a: sim.step_batch(s, a)[0].x.sum())(state, a)
        else:
            out = jax.jit(
                jax.grad(lambda a, s: sim.step_batch(s, a)[0].x.sum())
            )(a, state)
        jax.block_until_ready(out)
        ok = bool(jnp.isfinite(jnp.asarray(out)).all())
        print(json.dumps({**case, "ok": ok, "error": None}), flush=True)
    except Exception as e:  # noqa: BLE001 - record and classify offline
        print(json.dumps({**case, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
