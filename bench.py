"""Benchmark: env rollout steps/s/chip (forward + backward) on the flagship
fold_cloth3 configuration at high env batch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference publishes no numbers (BASELINE.md); its throughput probe is
``sps = ep_len * num_envs / iteration_walltime`` from the APG loop
(apg.py:340). We report the same quantity for a full BPTT training iteration
(rollout + backward + update), measured on one chip. ``vs_baseline`` is vs
the recorded CUDA-JAX reference sps in BASELINE.json (absent -> 1.0 self).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    env_steps = int(os.environ.get("BENCH_EP_LEN", 3))
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 1024))
    iters = int(os.environ.get("BENCH_ITERS", 3))

    from unidom_tpu.algorithms.apg import build_apg
    from unidom_tpu.engine.cloth import ClothConf
    from unidom_tpu.envs.cloth_tasks import FoldCloth3Env
    from unidom_tpu.parallel.mesh import make_env_mesh

    mesh = make_env_mesh()
    n_dev = mesh.devices.size
    num_envs = max(num_envs // n_dev, 1) * n_dev

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
    state = reset_batch(jax.random.PRNGKey(0))

    # compile
    ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)

    t0 = time.time()
    for _ in range(iters):
        ts, metrics = minimize(ts, state)
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters

    sps = env_steps * num_envs / dt / n_dev  # per chip
    baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE.json")) as f:
            baseline = json.load(f).get("published", {}).get("sps_fold_cloth3")
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
                "num_envs": num_envs,
                "ep_len": env_steps,
                "devices": n_dev,
                "platform": jax.devices()[0].platform,
                "iter_walltime_s": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
