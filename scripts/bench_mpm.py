"""End-to-end MPM training-iteration benchmark (whip_rope by default).

Times full APG iterations (BPTT rollout + backward + adam) on the real
chip — the only measurement the axon runtime reports faithfully
(docs/BENCHMARKS.md "Microbenchmark pitfalls"). Variants are selected via
env vars so head-to-heads run in one interpreter session:

    BENCH_ENV=whip_rope BENCH_NUM_ENVS=64 python scripts/bench_mpm.py

BENCH_BACKEND=xla|pallas forces the engine path (default: the conf's own
"auto", i.e. the fused Pallas kernel wherever it is eligible on TPU).
"""

import json
import os
import time

import jax


def main():
    env_name = os.environ.get("BENCH_ENV", "whip_rope")
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 64))
    ep_len = int(os.environ.get("BENCH_EP_LEN", 3))
    iters = int(os.environ.get("BENCH_ITERS", 3))

    from unidom_tpu.algorithms.apg import build_apg
    from unidom_tpu.envs.registration import env_functions
    from unidom_tpu.parallel.mesh import make_env_mesh

    mesh = make_env_mesh()
    n_dev = mesh.devices.size
    num_envs = max(num_envs // n_dev, 1) * n_dev

    backend = os.environ.get("BENCH_BACKEND", "")
    res_override = os.environ.get("BENCH_RES", "")
    kdtype = os.environ.get("BENCH_KERNEL_DTYPE", "")
    kw = {}
    if backend or res_override or kdtype:
        import dataclasses

        cls = env_functions[env_name]
        probe = cls(batch_size=1)
        repl = {}
        if backend:
            repl["backend"] = backend
        if res_override:
            repl["res"] = tuple(int(x) for x in res_override.split(","))
        if kdtype:
            repl["kernel_dtype"] = kdtype
        kw["conf"] = dataclasses.replace(probe.conf, **repl)
    env = env_functions[env_name](batch_size=num_envs // n_dev, **kw)
    env.reset(jax.random.PRNGKey(0))  # MPM envs size their obs at reset

    init_ts, minimize, reset_batch, _ = build_apg(
        env, episode_length=ep_len, learning_rate=1e-4,
        max_gradient_norm=0.3, mesh=mesh,
    )
    ts = init_ts(0)
    state = reset_batch(jax.random.PRNGKey(0))

    t0 = time.time()
    ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0

    # second warmup: the first minimize's outputs come back with shard_map
    # output shardings/layouts, which re-specializes the jit — a SECOND
    # ~full compile that must not land in the timed window (recorded in
    # runs/r5: pour_soup iter1 105 s vs steady-state 1.87 s)
    t0 = time.time()
    ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)
    compile2_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters

    sps = ep_len * num_envs / dt / n_dev
    print(json.dumps({
        "metric": f"{env_name} APG env-steps/s/chip (fwd+bwd)",
        "value": round(sps, 2),
        "unit": "steps/s/chip",
        "vs_baseline": None,  # no recorded reference-layout baseline for this env
        "num_envs": num_envs,
        "ep_len": ep_len,
        "res": list(env.conf.res),
        "backend": backend or "auto",
        "iter_walltime_s": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "compile2_s": round(compile2_s, 1),
    }))


if __name__ == "__main__":
    main()
