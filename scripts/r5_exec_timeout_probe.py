"""Axon single-execution wall-clock probe (B=16 fault bisect, level 4).

Every recorded shape_elasto device fault is a single XLA execution
estimated >60 s (B=16 training ~200 s, B=16 K=60 chain); every pass is
<~55 s (B=4 training 52 s/iter in r4, B=16 K<=20, pour_soup 33 s/iter).
Hypothesis: the fault is an axon-runtime per-execution limit, not a
Mosaic kernel bug. Test with a Pallas-free fori_loop of 8k matmuls whose
trip count sets the wall time:

    SECS=30 python scripts/r5_exec_timeout_probe.py
Prints {target_s, measured_s, ok, error}. Calibrates the per-iter matmul
cost with a short run first.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _run(n):
    @jax.jit
    def f(a):
        def body(_, a):
            a = a @ a
            return a / jnp.sqrt(jnp.mean(a * a) + 1e-6)
        return jax.lax.fori_loop(0, n, body, a)

    a = jax.random.normal(jax.random.PRNGKey(0), (8192, 8192), jnp.float32)
    t0 = time.time()
    out = f(a)
    # block_until_ready returns early through the axon tunnel (CLAUDE.md
    # "Never micro-benchmark ..."; first probe run read 0.9 s for a
    # nominal 240 s loop) — force a host readback of the result instead.
    _ = float(jnp.sum(out))
    return time.time() - t0


def main():
    target = float(os.environ.get("SECS", 30))
    case = {"target_s": target}
    try:
        warm = _run(8)          # compile + calibrate
        per_iter = _run(64) / 64
        n = max(int(target / per_iter), 8)
        case["n_iters"] = n
        t = _run(n)
        print(json.dumps({**case, "measured_s": round(t, 1), "ok": True,
                          "error": None}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({**case, "ok": False,
                          "error": f"{type(e).__name__}: {str(e)[:300]}"}),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
