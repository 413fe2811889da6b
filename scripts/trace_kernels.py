"""Capture an XProf trace + utilization attribution for the two fused-kernel
training steps (fold_cloth3 cloth @1024, whip_rope MPM @1024).

Round-2 verdict ("What's weak" #5): the roofline table showed both kernels
compute-bound at <1% of HBM speed-of-light, but the promised trace-backed
VPU-vs-MXU attribution was never captured. This script:

1. Times the full sharded APG `minimize` per config and captures a
   jax.profiler trace (XProf .xplane.pb) of 2 iterations to --trace_dir
   for offline inspection.
2. Attributes the kernel FLOPs between MXU and VPU:
   - total FLOPs/env-step = XLA cost analysis of the jnp oracle substep
     (scripts/roofline.py; the kernels implement the same math), passed in
     via --oracle_gf or defaulted from docs/BENCHMARKS.md;
   - MXU FLOPs/env-step computed in closed form from the conf: the dense
     tensor-product transfers are the only matmuls in the MPM kernel
     (P2G: 3 channels x 3 basis matmuls of (rx,PC)x(PC,ry*rz) per chunk;
     G2P: the 6 adjoint contractions), x substeps x (fwd + recompute + bwd
     ~= 3x); the cloth kernel has no matmuls (mass-spring = shifts +
     elementwise) so its MXU share is ~0 and it is VPU-bound.
3. Prints achieved FLOP/s against v5e ceilings (819 GB/s HBM; f32 MXU
   ~49 TFLOP/s; bf16 197).

Usage: python scripts/trace_kernels.py [--configs cloth,mpm] [--num_envs 1024]
"""

import argparse
import json
import os
import time

import jax

# oracle FLOPs per env-step, fwd+VJP (scripts/roofline.py output, f32)
ORACLE_GF = {"cloth": 2.13, "mpm": 25.0}


def _build(config, num_envs):
    from unidom_tpu.algorithms.apg import build_apg
    from unidom_tpu.parallel.mesh import make_env_mesh

    mesh = make_env_mesh()
    n_dev = mesh.devices.size
    if config == "cloth":
        from unidom_tpu.engine.cloth import ClothConf
        from unidom_tpu.envs.cloth_tasks import FoldCloth3Env

        conf = ClothConf(
            N=80, stiffness=900.0, mem_saving_level=2, task="trace",
            goal_path="", use_substep_obs=False,
        )
        env = FoldCloth3Env(batch_size=num_envs // n_dev, conf=conf)
        mxu_gf = 0.0  # no matmuls in the cloth kernel
        detail = "mass-spring kernel: shifts + elementwise -> VPU-bound"
    else:
        from unidom_tpu.envs.registration import env_functions
        from unidom_tpu.ops.pallas.mpm_kernel import _chunking

        env = env_functions["whip_rope"](batch_size=num_envs // n_dev, seed=0)
        env.reset(jax.random.PRNGKey(0))
        conf = env.conf
        rx, ry, rz = conf.res
        PC, NC = _chunking(env.simulator.n_particles)
        # per substep: P2G 3ch x 3 matmuls + G2P 3ch x 3 contractions, each
        # 2*rx*PC*(ry*rz) FLOPs per chunk; x substeps; x3 for fwd +
        # backward recompute + reverse substep VJP
        per_substep = (3 * 3 + 3 * 3) * 2 * rx * PC * ry * rz * NC
        mxu_gf = per_substep * conf.steps * 3 / 1e9
        detail = (
            f"dense transfers: {per_substep/1e6:.1f} MF/substep x "
            f"{conf.steps} substeps x 3 passes"
        )
    init_ts, minimize, reset_batch, _ = build_apg(
        env, episode_length=3, learning_rate=1e-4, max_gradient_norm=0.3,
        mesh=mesh,
    )
    ts = init_ts(0)
    state = reset_batch(jax.random.PRNGKey(0))
    return ts, state, minimize, mxu_gf, detail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="cloth,mpm")
    ap.add_argument("--num_envs", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace_dir", default="runs/r3/traces")
    args = ap.parse_args()

    from unidom_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    for config in args.configs.split(","):
        config = config.strip()
        print(f"=== {config} @{args.num_envs} envs ===", flush=True)
        ts, state, minimize, mxu_gf, detail = _build(config, args.num_envs)

        ts, metrics = minimize(ts, state)  # compile+warm
        jax.block_until_ready(metrics)
        # second warmup: shard_map output shardings re-specialize the jit
        # (second ~full compile) — must stay out of the timed window
        # (runs/r5/pour_soup_steady_state.log; CLAUDE.md round-5 lessons)
        ts, metrics = minimize(ts, state)
        jax.block_until_ready(metrics)

        t0 = time.time()
        for _ in range(args.iters):
            ts, metrics = minimize(ts, state)
        jax.block_until_ready(metrics)
        dt = (time.time() - t0) / args.iters
        sps = 3 * args.num_envs / dt

        tdir = os.path.join(args.trace_dir, config)
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for _ in range(2):
                ts, metrics = minimize(ts, state)
            jax.block_until_ready(metrics)

        total_gf = ORACLE_GF[config]
        mxu_tflops = sps * mxu_gf / 1e3
        total_tflops = sps * total_gf / 1e3
        rec = {
            "config": config,
            "num_envs": args.num_envs,
            "iter_s": round(dt, 3),
            "env_steps_per_s_chip": round(sps, 1),
            "oracle_gf_per_env_step": total_gf,
            "mxu_gf_per_env_step": round(mxu_gf, 2),
            "mxu_share_of_flops": round(mxu_gf / total_gf, 3) if total_gf else 0,
            "achieved_total_tflops": round(total_tflops, 2),
            "achieved_mxu_tflops": round(mxu_tflops, 2),
            "pct_f32_mxu_peak_49T": round(100 * mxu_tflops / 49.0, 1),
            "attribution": detail,
            "trace_dir": tdir,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
