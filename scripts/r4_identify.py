"""Round-4 identification record (verdict item 8: stiffness MAE 231 -> <=100
over the 929 range). Levers vs runs/r3/identify: 5x more experts (240),
SA-MSG grouping (models/pointnet2.py PointNetSAMSG — reference
pnet2_layers/layers.py:66-124), 512-point clouds, lower dropout, longer
training, and an honest 80/20 held-out split reported alongside the r3
train-set protocol.

Artifacts: runs/r4/identify/{expert_*.pkl,regressor.pkl,result.json}.
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
    out = os.environ.get("IDENTIFY_OUT", "runs/r5/identify")
    os.makedirs(out, exist_ok=True)
    t0 = time.time()

    env = env_functions["fold_cloth1"](batch_size=8, seed=0, aux_reward=True)

    n_instances = int(os.environ.get("IDENTIFY_INSTANCES", 30))
    print(f"[1/3] expert generation (8 envs x {n_instances} instances)", flush=True)
    generate_experts(
        env, out, n_instances=n_instances, horizon=2, solver_iters=30,
        param_ranges={"stiffness": (500.0, 1500.0)}, seed=0,
    )

    print(f"[2/3] regression ({time.time()-t0:.0f}s)", flush=True)
    clouds, params = load_expert_dataset(out, ["stiffness"], n_points=512)
    print(f"dataset: {clouds.shape} params {params.shape}", flush=True)
    rng_np = np.random.RandomState(0)
    perm = rng_np.permutation(clouds.shape[0])
    n_test = max(clouds.shape[0] // 5, 1)
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    reg = ParameterRegressor(n_params=1, lr=1e-3, seed=0, msg=True, dropout=0.2)
    reg.fit(clouds[train_idx], params[train_idx], epochs=200, batch_size=16,
            verbose=True)
    reg.save(os.path.join(out, "regressor.pkl"))

    def mae(idx):
        pred = reg.predict(clouds[idx])
        return float(np.abs(pred[:, 0] - params[idx, 0]).mean())

    rng = float(params[:, 0].max() - params[:, 0].min())
    mae_train, mae_test = mae(train_idx), mae(test_idx)
    mae_all = mae(np.arange(clouds.shape[0]))  # r3 protocol (whole set)
    print(f"stiffness MAE train {mae_train:.1f} test {mae_test:.1f} "
          f"all {mae_all:.1f} over range {rng:.1f}", flush=True)

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
        "n_experts": int(clouds.shape[0]),
        "stiffness_mae_train": mae_train,
        "stiffness_mae_test": mae_test,
        "stiffness_mae_all_r3_protocol": mae_all,
        "stiffness_range": rng,
        "resim_chamfer_pred_vs_true": float(np.mean(dists)),
        "resim_pred_stiffness_mean": float(np.mean(pred2)),
        "model": "PointNet2Cls(msg=True, dropout=0.2), 512 pts, 200 epochs",
        "walltime_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
