"""Round-5 big-kernel attribution probe: forward vs backward walltime of
the fused big-grid kernel at true res, measured as chained in-graph calls
(the only trustworthy timing on the axon runtime — docs/BENCHMARKS.md
"Microbenchmark pitfalls").

    SPLIT_ENV=shape_elasto_plastic SPLIT_B=4 python scripts/r5_bigrid_split.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unidom_tpu.envs.registration import env_functions
from unidom_tpu.utils.cache import enable_compilation_cache


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    enable_compilation_cache()
    env_name = os.environ.get("SPLIT_ENV", "shape_elasto_plastic")
    B = int(os.environ.get("SPLIT_B", 4))
    reps = int(os.environ.get("SPLIT_REPS", 3))
    env = env_functions[env_name](batch_size=B, seed=0)
    _, state = env.reset(jax.random.PRNGKey(0))
    sim = env.simulator
    print("backend:", sim.backend, flush=True)

    a0 = jnp.zeros((B, env.action_size), jnp.float32) + 0.05

    # chained fwd: N step_batch calls, each consuming the previous state
    def fwd_chain(state, n):
        def body(s, _):
            s2, _ = sim.step_batch(s, a0)
            return s2, ()
        s, _ = jax.lax.scan(body, state, None, length=n)
        return s.x.sum()

    f1 = jax.jit(lambda s: fwd_chain(s, 1))
    f4 = jax.jit(lambda s: fwd_chain(s, 4))
    t1 = timed(f1, state, n=reps)
    t4 = timed(f4, state, n=reps)
    per_step_fwd = (t4 - t1) / 3.0
    print(f"fwd: 1-call {t1:.3f}s 4-call {t4:.3f}s -> per macro-step fwd "
          f"{per_step_fwd:.3f}s", flush=True)

    # fwd+bwd of one macro step
    def loss1(s):
        s2, _ = sim.step_batch(s, a0)
        return s2.x.sum()

    g1 = jax.jit(jax.grad(lambda a, s: sim.step_batch(s, a)[0].x.sum()))
    tg = timed(g1, a0, state, n=reps)
    print(f"fwd+bwd one macro step: {tg:.3f}s -> bwd/fwd ratio "
          f"{(tg - t1) / max(t1, 1e-9):.1f}", flush=True)

    rec = dict(env=env_name, B=B, fwd_per_step_s=per_step_fwd,
               fwd_one=t1, fwdbwd_one=tg)
    print(json.dumps(rec))
    os.makedirs("runs/r5", exist_ok=True)
    with open(f"runs/r5/bigrid_split_{env_name}.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
