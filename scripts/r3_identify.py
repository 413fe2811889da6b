"""GenORM identification pipeline end-to-end on the real chip (round-2
verdict weak #6: train_para/identify/solver had never touched the TPU).

1. Expert generation (solver.generate_experts): fold_cloth1 with per-
   instance stiffness drawn from U(500, 1500) — the trajectory solver
   optimizes pick-and-place actions through the differentiable cloth sim
   (reference solve_action, GenORM solver.py:116-418).
2. Parameter regression (identify.ParameterRegressor): PointNet++ fits
   stiffness from the final point clouds (real2sim train.py:98-267).
3. Validation by re-simulation (identify.eval_by_resimulation): roll out
   the expert actions under the PREDICTED stiffness and compare chamfer
   to the true-parameter rollout (train.py:184-255).

Artifacts go to runs/r3/identify/: expert_*.pkl, regressor.pkl,
result.json.
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unidom_tpu.algorithms.identify import (
    ParameterRegressor,
    eval_by_resimulation,
    load_expert_dataset,
)
from unidom_tpu.algorithms.solver import generate_experts
from unidom_tpu.envs.registration import env_functions
from unidom_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    out = "runs/r3/identify"
    os.makedirs(out, exist_ok=True)
    t0 = time.time()

    env = env_functions["fold_cloth1"](batch_size=8, seed=0, aux_reward=True)

    print("[1/3] expert generation (8 envs x 6 instances)", flush=True)
    generate_experts(
        env, out, n_instances=6, horizon=2, solver_iters=30,
        param_ranges={"stiffness": (500.0, 1500.0)}, seed=0,
    )

    print(f"[2/3] regression ({time.time()-t0:.0f}s)", flush=True)
    clouds, params = load_expert_dataset(out, ["stiffness"], n_points=256)
    print(f"dataset: {clouds.shape} params {params.shape}")
    reg = ParameterRegressor(n_params=1, lr=1e-3, seed=0)
    reg.fit(clouds, params, epochs=60, batch_size=16, verbose=True)
    pred = reg.predict(clouds)
    mae = float(np.abs(pred[:, 0] - params[:, 0]).mean())
    rng = float(params[:, 0].max() - params[:, 0].min())
    reg.save(os.path.join(out, "regressor.pkl"))
    print(f"stiffness MAE {mae:.1f} over range {rng:.1f}")

    print(f"[3/3] re-simulation validation ({time.time()-t0:.0f}s)", flush=True)
    import pickle

    with open(os.path.join(out, "expert_0000.pkl"), "rb") as f:
        rec = pickle.load(f)
    _, state = env.reset(jax.random.PRNGKey(0))
    dists, pred2 = eval_by_resimulation(
        env, reg, state, rec["action"], ["stiffness"],
        rec["params"]["stiffness"][:, None],
    )
    result = {
        "n_experts": 6 * 8,
        "stiffness_mae": mae,
        "stiffness_range": rng,
        "resim_chamfer_pred_vs_true": float(np.mean(dists)),
        "resim_pred_stiffness_mean": float(np.mean(pred2)),
        "walltime_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
