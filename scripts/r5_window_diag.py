"""Round-5 kernel-rework sizing diagnostic: per-super-chunk x/y cell
spreads under an (x, y)-lexicographic particle sort, measured on a real
pour_soup rollout (random pour actions). The super-chunk transfer rework
gives every group of G consecutive 128-particle chunks ONE shared dynamic
x-window (WX rows) and y-window (WY rows); support outside the window is
dropped (the reference's own out-of-bounds scatter behavior,
mpm_simulator.py:189-192), so WX/WY must cover the measured spreads.

    python scripts/r5_window_diag.py            # pour_soup on TPU
    DIAG_ENV=shape_elasto_plastic python ...    # dense-x candidate check
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from unidom_tpu.envs.registration import env_functions
from unidom_tpu.utils.cache import enable_compilation_cache


def spreads(x, inv_dx, ry, pc, g):
    """x: (B, P, 3). Returns per-(env, super-chunk) x/y spreads in cells."""
    B, P, _ = x.shape
    xc = np.floor(np.asarray(x[..., 0]) * inv_dx - 0.5).astype(np.int64)
    yc = np.floor(np.asarray(x[..., 1]) * inv_dx - 0.5).astype(np.int64)
    key = xc * (2 * ry + 2) + yc
    order = np.argsort(key, axis=1, kind="stable")
    sx, sy = [], []
    spc = pc * g
    for b in range(B):
        xs = xc[b, order[b]]
        ys = yc[b, order[b]]
        for s in range(0, P, spc):
            xw = xs[s : s + spc]
            yw = ys[s : s + spc]
            sx.append(int(xw.max() - xw.min()))
            sy.append(int(yw.max() - yw.min()))
    return np.array(sx), np.array(sy)


def main():
    enable_compilation_cache()
    env_name = os.environ.get("DIAG_ENV", "pour_soup")
    steps = int(os.environ.get("DIAG_STEPS", 20))
    B = int(os.environ.get("DIAG_B", 2))
    env = env_functions[env_name](batch_size=B, seed=0)
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    conf = env.conf
    inv_dx = conf.inv_dx
    ry = conf.res[1]

    rows = []
    for g in (2, 4, 8):
        sx, sy = spreads(state.x, inv_dx, ry, 128, g)
        rows.append(("reset", g, sx, sy))

    rng = np.random.RandomState(0)
    for t in range(steps):
        act = jnp.asarray(
            rng.uniform(-0.6, 0.6, (B, env.action_size)).astype(np.float32)
        )
        _, reward, done, info = env.step_diff(act, state)
        state = info["state"]
        for g in (2, 4, 8):
            sx, sy = spreads(state.x, inv_dx, ry, 128, g)
            rows.append((f"t{t}", g, sx, sy))
        if t % 5 == 0:
            print(f"step {t} reward {np.asarray(reward).mean():.4f}", flush=True)

    out = {}
    for g in (2, 4, 8):
        gx = np.concatenate([r[2] for r in rows if r[1] == g])
        gy = np.concatenate([r[3] for r in rows if r[1] == g])
        out[f"G{g}"] = {
            "x_max": int(gx.max()), "x_p99": float(np.percentile(gx, 99)),
            "y_max": int(gy.max()), "y_p99": float(np.percentile(gy, 99)),
        }
    rec = {"env": env_name, "steps": steps, "B": B, "spreads": out}
    print(json.dumps(rec))
    os.makedirs("runs/r5", exist_ok=True)
    with open(f"runs/r5/window_diag_{env_name}.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
