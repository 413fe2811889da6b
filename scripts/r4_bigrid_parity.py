"""True-resolution big-grid kernel parity + gradient sanity on the real TPU.

For pour_soup (res (128, 64, 128) ~= 1M cells) and shape_elasto_plastic
(~33k particles): build the env twice (XLA oracle / pallas_big), run one
step_diff forward from the same reset state, compare final particle states,
and check one BPTT gradient is finite and matches direction. The XLA oracle
at these scales is exactly the path that device-faulted in round 3
(runs/r3/bigrid_rows.jsonl) — a fault here is itself a recorded result.

    python scripts/r4_bigrid_parity.py [pour_soup|shape_elasto_plastic] ...
"""

import json
import sys
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np


def run_env(name, backend, state_override=None):
    from unidom_tpu.envs.registration import env_functions

    cls = env_functions[name]
    probe = cls(batch_size=1)
    conf = replace(probe.conf, backend=backend)
    env = cls(batch_size=1, conf=conf)
    obs, state = env.reset(jax.random.PRNGKey(0))
    if state_override is not None:
        state = state_override
    if name == "pour_soup":
        a = jnp.zeros((1, 6), jnp.float32) + 0.3
    else:
        a = jnp.asarray(np.array([[0.45, 0.0, 0.5, 0.55, 0.0, 0.5]], np.float32))

    t0 = time.time()
    obs, reward, done, info = env.step_diff(a, state)
    jax.block_until_ready(reward)
    fwd_s = time.time() - t0

    def loss(a):
        _, r, _, _ = env.step_diff(a, state)
        return -r.sum()

    t0 = time.time()
    g = jax.jit(jax.grad(loss))(a)
    g = np.asarray(jax.block_until_ready(g))
    bwd_s = time.time() - t0
    return env, state, np.asarray(info["state"].x), reward, g, fwd_s, bwd_s


def main():
    names = sys.argv[1:] or ["shape_elasto_plastic", "pour_soup"]
    for name in names:
        row = {"env": name}
        try:
            env_b, state, xb, rb, gb, fwd_b, bwd_b = run_env(name, "pallas_big")
            row.update(
                backend=env_b.simulator.backend,
                n_particles=env_b.simulator.n_particles,
                res=list(env_b.conf.res),
                pallas_fwd_s=round(fwd_b, 2), pallas_bwd_s=round(bwd_b, 2),
                pallas_finite=bool(np.isfinite(xb).all()),
                grad_finite=bool(np.isfinite(gb).all()),
                grad_norm=float(np.linalg.norm(gb)),
                reward=float(np.asarray(rb).sum()),
            )
        except Exception as e:  # noqa: BLE001
            row["pallas_error"] = repr(e)[:500]
            print(json.dumps(row), flush=True)
            continue
        try:
            _, _, xr, rr, gr, fwd_x, bwd_x = run_env(name, "xla", state)
            dx = np.abs(xr - xb).max()
            cos = float(
                (gr.ravel() @ gb.ravel())
                / (np.linalg.norm(gr) * np.linalg.norm(gb) + 1e-12)
            )
            row.update(
                xla_fwd_s=round(fwd_x, 2), xla_bwd_s=round(bwd_x, 2),
                x_maxdiff=float(dx),
                x_scale=float(np.abs(xr).max()),
                grad_cos_vs_xla=cos,
                reward_xla=float(np.asarray(rr).sum()),
            )
        except Exception as e:  # noqa: BLE001
            row["xla_error"] = repr(e)[:500]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
