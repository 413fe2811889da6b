"""Material-parameter identification (real2sim / sim2sim pipelines).

Reference: PlasticineLab/{real2sim,sim2sim}/src/move/train.py:98-267 — a
PointNet++ regresses normalized (E, nu) from observed point clouds; training
data comes from the expert factory across randomized parameters; validation
re-simulates with predicted parameters and compares chamfer distance of the
rollouts (train.py:184-255).

Here the dataset is the pickles written by
``unidom_tpu.algorithms.solver.generate_experts`` and the regressor is
``PointNet2Cls``; the whole train step is one jitted function.
"""

import glob
import os
import pickle
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unidom_tpu.models.pointnet2 import PointNet2Cls
from unidom_tpu.ops.metrics import chamfer


def load_expert_dataset(data_dir: str, param_names: Sequence[str], n_points=512):
    """Stack expert pickles into (clouds (M, n_points, 3), params (M, P)).

    Subsampling uses the native FPS (unidom_tpu/io/native) for even surface
    coverage — the counterpart of the reference's CUDA
    ``farthest_point_sample`` in its data path."""
    from unidom_tpu.io import native

    clouds, params = [], []
    for path in sorted(glob.glob(os.path.join(data_dir, "expert_*.pkl"))):
        with open(path, "rb") as f:
            rec = pickle.load(f)
        pc = rec["pc_after"]  # (B, N, 3)
        for b in range(pc.shape[0]):
            pts = pc[b]
            if pts.shape[0] >= n_points:
                sel = native.fps(pts, n_points)
            else:
                sel = np.random.choice(pts.shape[0], n_points, replace=True)
            clouds.append(pts[sel])
            params.append([rec["params"][k][b] for k in param_names])
    return np.asarray(clouds, np.float32), np.asarray(params, np.float32)


class ParameterRegressor:
    """PointNet++ (E, nu, ...) regressor with target normalization."""

    def __init__(self, n_params: int, lr=1e-3, seed=0, **model_kwargs):
        self.model = PointNet2Cls(out_dim=n_params, **model_kwargs)
        self.optim = optax.adam(lr)
        self.key = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.target_lo = None
        self.target_hi = None
        self._step = jax.jit(self._build_step())

    def _build_step(self):
        def loss_fn(params, clouds, targets, key):
            pred = self.model.apply(params, clouds, deterministic=False,
                                    rngs={"dropout": key})
            return jnp.mean((pred - targets) ** 2)

        grad_fn = jax.value_and_grad(loss_fn)

        def step(params, opt_state, clouds, targets, key):
            loss, g = grad_fn(params, clouds, targets, key)
            updates, opt_state = self.optim.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def _normalize(self, targets):
        return (targets - self.target_lo) / (self.target_hi - self.target_lo + 1e-12)

    def _denormalize(self, norm):
        return norm * (self.target_hi - self.target_lo) + self.target_lo

    def fit(self, clouds, targets, epochs=20, batch_size=16, verbose=False):
        self.target_lo = targets.min(0)
        self.target_hi = targets.max(0)
        targets_n = self._normalize(targets)

        if self.params is None:
            self.key, k = jax.random.split(self.key)
            self.params = self.model.init(k, jnp.asarray(clouds[:1]))
            self.opt_state = self.optim.init(self.params)

        n = clouds.shape[0]
        history = []
        for ep in range(epochs):
            perm = np.random.permutation(n)
            ep_loss = 0.0
            for i in range(0, n, batch_size):
                sel = perm[i : i + batch_size]
                self.key, k = jax.random.split(self.key)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state,
                    jnp.asarray(clouds[sel]), jnp.asarray(targets_n[sel]), k,
                )
                ep_loss += float(loss) * len(sel)
            history.append(ep_loss / n)
            if verbose and ep % 5 == 0:
                print(f"  epoch {ep}: mse {history[-1]:.5f}")
        return history

    def predict(self, clouds):
        pred = self.model.apply(self.params, jnp.asarray(clouds), deterministic=True)
        return np.asarray(self._denormalize(pred))

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump({"params": jax.device_get(self.params),
                         "lo": self.target_lo, "hi": self.target_hi}, f)

    def load(self, path):
        with open(path, "rb") as f:
            d = pickle.load(f)
        self.params = d["params"]
        self.target_lo, self.target_hi = d["lo"], d["hi"]


def eval_by_resimulation(env, regressor, state, actions, param_names, true_params):
    """Validation loop of train.py:184-255: roll out with ground-truth vs
    predicted parameters and compare final-state chamfer."""
    def rollout(state, overrides):
        for name, val in overrides.items():
            leaf = getattr(state, name)
            val = jnp.broadcast_to(
                jnp.asarray(val).reshape((leaf.shape[0],) + (1,) * (leaf.ndim - 1)),
                leaf.shape,
            ).astype(leaf.dtype)
            state = state._replace(**{name: val})
        for t in range(actions.shape[1]):
            _, _, _, info = env.step_diff(actions[:, t], state)
            state = info["state"]
        return env.packed_x(state) if hasattr(env, "packed_x") else state.x

    x_true = rollout(state, dict(zip(param_names, true_params.T)))
    clouds = np.asarray(x_true)
    pred = regressor.predict(clouds)
    x_pred = rollout(state, dict(zip(param_names, pred.T)))

    dists = [float(chamfer(x_pred[b : b + 1], x_true[b]).squeeze())
             for b in range(x_true.shape[0])]
    return np.asarray(dists), pred
