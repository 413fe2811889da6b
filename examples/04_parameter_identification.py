"""GenORM-style pipeline: generate experts across random stiffness, train a
PointNet++ regressor on the resulting clouds, validate by re-simulation."""

import tempfile

import numpy as np

import unidom_tpu
from unidom_tpu.algorithms.identify import ParameterRegressor, load_expert_dataset
from unidom_tpu.algorithms.solver import generate_experts

env = unidom_tpu.make_env("fold_cloth1", batch_size=4, seed=1, aux_reward=True)

with tempfile.TemporaryDirectory() as d:
    generate_experts(
        env, d, n_instances=8, horizon=2, solver_iters=10,
        param_ranges={"stiffness": (300.0, 1800.0)},
    )
    clouds, targets = load_expert_dataset(d, ["stiffness"], n_points=256)

print("dataset:", clouds.shape, targets.shape)
reg = ParameterRegressor(n_params=1, lr=1e-3)
reg.fit(clouds, targets, epochs=20, batch_size=8, verbose=True)
pred = reg.predict(clouds)
err = np.abs(pred - targets).mean()
print(f"mean |stiffness error|: {err:.1f} (range {targets.min():.0f}-{targets.max():.0f})")
