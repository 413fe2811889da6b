"""Benchmark: env rollout steps/s/chip (forward + backward) on the flagship
fold_cloth3 configuration at high env batch.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
...extras}. All progress goes to stderr so stdout stays machine-parseable.

The reference publishes no numbers (BASELINE.md); its throughput probe is
``sps = ep_len * num_envs / iteration_walltime`` from the APG loop
(reference apg.py:340). We report the same quantity for a full BPTT training
iteration (rollout + backward + update), measured on one chip.

``vs_baseline`` compares against the recorded reference-layout sps in
BASELINE.json["published"]["sps_fold_cloth3_reference_layout"] — the
reference's pure-JAX cloth engine semantics (27x-materialized packed gather,
cloth_simulator.py:68-70) run under this exact harness on this chip (see
scripts/bench_baseline.py). Absent -> 1.0 (self).

Knobs: BENCH_NUM_ENVS (default 1024), BENCH_EP_LEN (3), BENCH_ITERS (3),
BENCH_FAST=1 (256 envs — safety net for tight driver budgets).

First-compile latency is the historical failure mode (round 1 timed out
before printing): the axon backend compiles remotely, 2-5 min for this graph.
We enable the persistent compilation cache so that cost is paid once per
container; a primed cache brings total bench walltime to well under a minute.
"""

import json
import os
import sys
import time


def log(msg):
    print(f"[bench +{time.time() - T0:.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def main():
    from unidom_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"compilation cache at {cache_dir}")

    import jax

    env_steps = int(os.environ.get("BENCH_EP_LEN", 3))
    if os.environ.get("BENCH_FAST"):
        num_envs = int(os.environ.get("BENCH_NUM_ENVS", 256))
    else:
        num_envs = int(os.environ.get("BENCH_NUM_ENVS", 1024))
    iters = int(os.environ.get("BENCH_ITERS", 3))

    from unidom_tpu.algorithms.apg import build_apg
    from unidom_tpu.engine.cloth import ClothConf
    from unidom_tpu.envs.cloth_tasks import FoldCloth3Env
    from unidom_tpu.parallel.mesh import make_env_mesh

    mesh = make_env_mesh()
    n_dev = mesh.devices.size
    num_envs = max(num_envs // n_dev, 1) * n_dev
    log(f"devices={n_dev} platform={jax.devices()[0].platform} num_envs={num_envs}")

    # mem_saving_level=2 (the reference's fold_cloth3 default): remat both the
    # substep scan and the robot step — residual memory goes from
    # O(substeps * subactions) to O(subactions) states per env, which is what
    # lets 1024 envs fit in one chip's HBM.
    conf = ClothConf(
        N=80, stiffness=900.0, mem_saving_level=2, task="bench_fold_cloth3",
        goal_path="", use_substep_obs=False,
    )
    env = FoldCloth3Env(batch_size=num_envs // n_dev, conf=conf)

    init_ts, minimize, reset_batch, _ = build_apg(
        env, episode_length=env_steps, learning_rate=1e-4,
        max_gradient_norm=0.3, mesh=mesh,
    )
    ts = init_ts(0)
    log("building first state")
    state = reset_batch(jax.random.PRNGKey(0))
    jax.block_until_ready(state)

    log("compiling minimize (first call; cached after first container run)")
    ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)
    log(f"compile + first iter done ({time.time() - T0:.1f}s total)")

    # Median over repeated pipelined chains: iterations inside a chain stay
    # data-dependent (ts feeds back) so dispatch pipelines through the tunnel;
    # the median across chains rejects the tunnel's multi-second jitter.
    reps = int(os.environ.get("BENCH_REPS", 3))
    chain_times = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(iters):
            ts, metrics = minimize(ts, state)
        jax.block_until_ready(metrics)
        chain_times.append((time.time() - t0) / iters)
    dt = sorted(chain_times)[len(chain_times) // 2]
    log(
        f"{reps} chains x {iters} iters done, median {dt:.3f}s/iter "
        f"({[round(t, 2) for t in chain_times]})"
    )

    sps = env_steps * num_envs / dt / n_dev  # per chip
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            pub = json.load(f).get("published", {})
        baseline = pub.get("sps_fold_cloth3_reference_layout")
    except Exception:
        pass
    vs = sps / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "fold_cloth3 APG env-steps/s/chip (fwd+bwd)",
                "value": round(sps, 2),
                "unit": "steps/s/chip",
                "vs_baseline": round(vs, 3),
                "baseline_sps": baseline,
                "num_envs": num_envs,
                "ep_len": env_steps,
                "devices": n_dev,
                "platform": jax.devices()[0].platform,
                "iter_walltime_s": round(dt, 3),
                "total_walltime_s": round(time.time() - T0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
