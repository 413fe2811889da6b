"""Benchmark: env rollout steps/s/chip (forward + backward).

Prints ONE JSON line on stdout. The primary metric is the flagship
fold_cloth3 APG training iteration at 4096 envs (BASELINE.json's metric:
"env rollout steps/s/chip (fwd+bwd) at 4096 envs"); additional rows —
fold_cloth3 @1024 (round-1/2 comparable) and the whip_rope MPM config —
ride in the same JSON object under "rows". All progress goes to stderr so
stdout stays machine-parseable.

The reference publishes no numbers (BASELINE.md); its throughput probe is
``sps = ep_len * num_envs / iteration_walltime`` from the APG loop
(reference apg.py:340). We report the same quantity for a full BPTT training
iteration (rollout + backward + update), measured on one chip.

``vs_baseline`` compares against the recorded reference-layout sps in
BASELINE.json["published"] — the reference's pure-JAX engine semantics run
under this exact harness on this chip (scripts/bench_baseline.py for cloth,
scripts/bench_mpm.py --layout reference for MPM). Absent -> null.

Knobs: BENCH_ROWS (comma list from {cloth4096, cloth1024, mpm1024};
default all three), BENCH_NUM_ENVS (override env count for a single cloth
row), BENCH_EP_LEN (3), BENCH_ITERS (3), BENCH_REPS (3),
BENCH_FAST=1 (one 256-env cloth row — safety net for tight driver budgets).

First-compile latency is the historical failure mode (round 1 timed out
before printing): the axon backend compiles remotely, 2-5 min per new graph
shape. The persistent compilation cache makes that cost once-per-container;
a primed cache brings total bench walltime to a few minutes for all rows.
"""

import json
import os
import sys
import time


def log(msg):
    print(f"[bench +{time.time() - T0:.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def _measure_minimize(env, mesh, num_envs, ep_len, iters, reps):
    """Median per-iteration walltime of the full sharded APG update."""
    import jax

    from unidom_tpu.algorithms.apg import build_apg

    init_ts, minimize, reset_batch, _ = build_apg(
        env, episode_length=ep_len, learning_rate=1e-4,
        max_gradient_norm=0.3, mesh=mesh,
    )
    ts = init_ts(0)
    state = reset_batch(jax.random.PRNGKey(0))
    jax.block_until_ready(state)

    log("compiling minimize (first call; cached after first container run)")
    ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)
    log(f"compile + first iter done ({time.time() - T0:.1f}s total)")

    # Median over repeated pipelined chains: iterations inside a chain stay
    # data-dependent (ts feeds back) so dispatch pipelines through the tunnel;
    # the median across chains rejects the tunnel's multi-second jitter.
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
    return dt


def _cloth_row(num_envs, mesh, ep_len, iters, reps, baseline):
    from unidom_tpu.engine.cloth import ClothConf
    from unidom_tpu.envs.cloth_tasks import FoldCloth3Env

    n_dev = mesh.devices.size
    num_envs = max(num_envs // n_dev, 1) * n_dev
    log(f"--- cloth row: fold_cloth3 @ {num_envs} envs")
    # mem_saving_level=2 (the reference's fold_cloth3 default): remat both the
    # substep scan and the robot step — residual memory goes from
    # O(substeps * subactions) to O(subactions) states per env, which is what
    # lets 4096 envs fit in one chip's HBM.
    # kernel_dtype stays f32 here regardless of BENCH_KDTYPE: the cloth
    # bf16 probe was REJECTED on numerics (docs/BENCHMARKS.md round-4 table
    # — the spring coefficient cancels ~80-scale terms below bf16's
    # mantissa), so the shipped cloth config is f32-only and BENCH_KDTYPE
    # measures the MPM row's opt-in bf16 delta.
    conf = ClothConf(
        N=80, stiffness=900.0, mem_saving_level=2, task="bench_fold_cloth3",
        goal_path="", use_substep_obs=False,
    )
    env = FoldCloth3Env(batch_size=num_envs // n_dev, conf=conf)
    dt = _measure_minimize(env, mesh, num_envs, ep_len, iters, reps)
    sps = ep_len * num_envs / dt / n_dev
    return {
        "metric": "fold_cloth3 APG env-steps/s/chip (fwd+bwd)",
        "value": round(sps, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(sps / baseline, 3) if baseline else None,
        "baseline_sps": baseline,
        "num_envs": num_envs,
        "ep_len": ep_len,
        "iter_walltime_s": round(dt, 3),
    }


def _mpm_row(num_envs, mesh, ep_len, iters, reps, baseline):
    import jax

    from unidom_tpu.envs.registration import env_functions

    n_dev = mesh.devices.size
    num_envs = max(num_envs // n_dev, 1) * n_dev
    log(f"--- mpm row: whip_rope @ {num_envs} envs")
    # whip_rope: the BASELINE MPM config (70 substeps/macro-step, n_grid 64,
    # fused Pallas macro-step kernel with in-kernel segmented backward)
    import dataclasses as _dc
    import os as _os

    kw = {}
    kdtype = _os.environ.get("BENCH_KDTYPE", "f32")
    if kdtype != "f32":
        probe = env_functions["whip_rope"](batch_size=1)
        kw["conf"] = _dc.replace(probe.conf, kernel_dtype=kdtype)
    env = env_functions["whip_rope"](batch_size=num_envs // n_dev, seed=0, **kw)
    env.reset(jax.random.PRNGKey(0))  # sizes the observation space
    dt = _measure_minimize(env, mesh, num_envs, ep_len, iters, reps)
    sps = ep_len * num_envs / dt / n_dev
    return {
        "metric": "whip_rope APG env-steps/s/chip (fwd+bwd)",
        "value": round(sps, 2),
        "unit": "steps/s/chip",
        "vs_baseline": round(sps / baseline, 3) if baseline else None,
        "baseline_sps": baseline,
        "num_envs": num_envs,
        "ep_len": ep_len,
        "iter_walltime_s": round(dt, 3),
    }


def main():
    from unidom_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"compilation cache at {cache_dir}")

    import jax

    from unidom_tpu.parallel.mesh import make_env_mesh

    ep_len = int(os.environ.get("BENCH_EP_LEN", 3))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    reps = int(os.environ.get("BENCH_REPS", 3))

    mesh = make_env_mesh()
    n_dev = mesh.devices.size
    log(f"devices={n_dev} platform={jax.devices()[0].platform}")

    pub = {}
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            pub = json.load(f).get("published", {})
    except Exception:
        pass
    cloth_base = pub.get("sps_fold_cloth3_reference_layout")
    mpm_base = pub.get("sps_whip_rope_reference_layout")

    if os.environ.get("BENCH_FAST"):
        rows_req = ["cloth256"]
    elif os.environ.get("BENCH_NUM_ENVS"):
        rows_req = [f"cloth{int(os.environ['BENCH_NUM_ENVS'])}"]
    else:
        rows_req = os.environ.get(
            "BENCH_ROWS", "cloth4096,cloth1024,mpm1024"
        ).split(",")

    rows = []
    for r in rows_req:
        r = r.strip()
        try:
            if r.startswith("cloth"):
                rows.append(
                    _cloth_row(int(r[5:]), mesh, ep_len, iters, reps, cloth_base)
                )
            elif r.startswith("mpm"):
                rows.append(
                    _mpm_row(int(r[3:]), mesh, ep_len, iters, reps, mpm_base)
                )
            else:
                log(f"unknown bench row {r!r}, skipped")
        except Exception as e:  # one bad row must not sink the whole record
            log(f"row {r} FAILED: {type(e).__name__}: {e}")
            if not rows and r == rows_req[-1].strip():
                raise
    if not rows:
        raise SystemExit("no bench rows succeeded")

    head = dict(rows[0])
    head["rows"] = rows
    head["devices"] = n_dev
    head["platform"] = jax.devices()[0].platform
    head["total_walltime_s"] = round(time.time() - T0, 1)
    print(json.dumps(head), flush=True)


if __name__ == "__main__":
    main()
