"""Round-5 verdict item 3: ON-CHIP numerical parity of the big-grid kernel
at true resolution, against the XLA oracle run on CPU (the full-grid oracle
does not compile on TPU at these shapes — runs/r4/bigrid_parity3.jsonl).

Two phases in separate processes (the oracle must run on the CPU backend):

  # phase 1 (TPU): run one macro step fwd + action-VJP through the kernel
  PHASE=tpu PARITY_ENV=pour_soup python scripts/r5_onchip_parity.py
  # phase 2 (CPU): replay the same state through the jnp oracle, compare
  PHASE=cpu PARITY_ENV=pour_soup python scripts/r5_onchip_parity.py

Phase 1 dumps state/action/outputs to runs/r5/onchip_<env>.npz; phase 2
appends the maxdiff row to runs/r5/onchip_parity.jsonl. CPU-interpret
parity (tests/test_pallas_mpm_big.py) pins the kernel against the oracle in
interpret mode; THIS record pins the real Mosaic-compiled kernel — the
documented interpret-mode false-pass classes (CLAUDE.md) make that a
separate claim.
"""

import json
import os
import sys

import numpy as np

_PHASE = os.environ.get("PHASE", "tpu")
if _PHASE == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

if _PHASE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unidom_tpu.engine.mpm import MPMState  # noqa: E402
from unidom_tpu.envs.registration import env_functions  # noqa: E402
from unidom_tpu.utils.cache import enable_compilation_cache  # noqa: E402

_FIELDS_CMP = ["x", "v", "C", "F", "J"]


def _loss_cot(s):
    """Fixed deterministic scalar for the VJP seed."""
    w = jnp.sin(jnp.arange(s.x.size, dtype=jnp.float32).reshape(s.x.shape))
    return jnp.sum(s.x * w) + 0.1 * jnp.sum(s.v)


def build_env(name):
    env = env_functions[name](batch_size=1, seed=0)
    _, state = env.reset(jax.random.PRNGKey(0))
    return env, state


def main():
    enable_compilation_cache()
    name = os.environ.get("PARITY_ENV", "pour_soup")
    path = f"runs/r5/onchip_{name}.npz"
    os.makedirs("runs/r5", exist_ok=True)

    env, state = build_env(name)
    sim = env.simulator
    araw = jnp.full((1, 6 * len(state.primitives)), 0.03, jnp.float32)

    def fwd(s, a):
        out, _ = sim.step_batch(s, a)
        return out

    def act_grad(s, a):
        return jax.grad(lambda a: _loss_cot(fwd(s, a)))(a)

    if _PHASE == "tpu":
        assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
        assert sim.backend == "pallas_big", sim.backend
        out = jax.jit(fwd)(state, araw)
        g = jax.jit(act_grad)(state, araw)
        rec = {f"in_{k}": np.asarray(getattr(state, k))
               for k in _FIELDS_CMP + ["mu", "lamda", "yield_stress", "friction"]}
        for k in _FIELDS_CMP:
            rec[f"out_{k}"] = np.asarray(getattr(out, k))
        rec["action"] = np.asarray(araw)
        rec["grad"] = np.asarray(g)
        for ip, pr in enumerate(state.primitives):
            rec[f"prim{ip}_pos"] = np.asarray(pr.position)
            rec[f"prim{ip}_rot"] = np.asarray(pr.rotation)
            rec[f"prim{ip}_v"] = np.asarray(pr.v)
            rec[f"prim{ip}_w"] = np.asarray(pr.w)
        np.savez_compressed(path, **rec)
        print(f"TPU phase done -> {path}; grad finite: "
              f"{bool(np.isfinite(rec['grad']).all())}")
        return

    # ---- CPU oracle phase ----
    assert jax.default_backend() == "cpu"
    rec = dict(np.load(path))
    # rebuild an identically-shaped env on the XLA oracle backend
    import dataclasses

    env_x = env_functions[name](
        batch_size=1, seed=0,
        conf=dataclasses.replace(env.conf, backend="xla"),
    )
    _, state_x = env_x.reset(jax.random.PRNGKey(0))
    sim_x = env_x.simulator
    assert sim_x.backend == "xla", sim_x.backend
    # overwrite with the recorded TPU input state (bitwise identical input)
    repl = {k: jnp.asarray(rec[f"in_{k}"])
            for k in _FIELDS_CMP + ["mu", "lamda", "yield_stress", "friction"]}
    prims = []
    for ip, pr in enumerate(state_x.primitives):
        prims.append(pr._replace(
            position=jnp.asarray(rec[f"prim{ip}_pos"]),
            rotation=jnp.asarray(rec[f"prim{ip}_rot"]),
            v=jnp.asarray(rec[f"prim{ip}_v"]),
            w=jnp.asarray(rec[f"prim{ip}_w"]),
        ))
    state_x = state_x._replace(primitives=tuple(prims), **repl)
    araw = jnp.asarray(rec["action"])

    def fwd_x(s, a):
        out, _ = sim_x.step_batch(s, a)
        return out

    out_x = jax.jit(fwd_x)(state_x, araw)
    g_x = jax.jit(
        lambda s, a: jax.grad(lambda a: _loss_cot(fwd_x(s, a)))(a)
    )(state_x, araw)

    row = {"env": name, "res": list(env.conf.res),
           "n_particles": int(sim_x.n_particles)}
    for k in _FIELDS_CMP:
        o = np.asarray(getattr(out_x, k))
        t = rec[f"out_{k}"]
        scale = np.abs(o).max() + 1e-12
        row[f"maxdiff_{k}"] = float(np.abs(o - t).max())
        row[f"reldiff_{k}"] = float(np.abs(o - t).max() / scale)
    gt = rec["grad"]
    go = np.asarray(g_x)
    row["grad_maxdiff"] = float(np.abs(go - gt).max())
    row["grad_cosine"] = float(
        (go * gt).sum() / (np.linalg.norm(go) * np.linalg.norm(gt) + 1e-12)
    )
    print(json.dumps(row))
    with open("runs/r5/onchip_parity.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
