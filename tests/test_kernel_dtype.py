"""Mixed-precision (kernel_dtype="bf16") probe contracts (round-3 verdict
items 4/10).

MPM: basis planes / transfer-matmul operands / grid ops in bf16 with f32
particle state and accumulation keeps positions at ~2e-4 of the oracle and
action gradients at cosine ~1 — shippable as an opt-in knob.

Cloth: full-bf16 state is numerically REJECTED (the spring coefficient
stiff*(1/rest - 1/cur) cancels ~80-scale terms; fwd positions drift to
~0.2 on [0,1] in 10 substeps, grad cosine ~0.8) — this test pins the
rejection evidence so a future bf16 attempt must beat it consciously.
Throughput numbers for both: docs/BENCHMARKS.md (runs/r4/bench_bf16.json).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.engine.mpm import ELASTIC, MPMConf, MPMSimulator
from unidom_tpu.engine.primitives import create_primitive

B = 2


def _build_mpm(backend, kernel_dtype="f32", use_pc=True):
    conf = MPMConf(n_grid=32, dt=2e-4, steps=8, E=100.0, nu=0.1,
                   res=(16, 16, 16), ground_friction=0.5, backend=backend,
                   kernel_dtype=kernel_dtype, task="t", goal_path="")
    sim = MPMSimulator(conf, batch_size=B, use_position_control=use_pc)
    state = sim.add_box(None, size=[0.25, 0.06, 0.06], init_pos=[0.5, 0.08, 0.5],
                        material=ELASTIC, density=1.5)
    prim = create_primitive(conf.steps, friction=0.2, softness=666.0,
                            color=[0.5] * 3, size=[0.03] * 3,
                            init_pos=[0.5, 0.06, 0.46])
    state.primitives.append(prim)
    sim.register_primitive_sdf("box")
    return sim, sim.reset(state)


def test_mpm_bf16_positions_and_grads_track_oracle():
    sim_x, state = _build_mpm("xla")
    sim_b, _ = _build_mpm("pallas", "bf16")
    state = state._replace(
        v=jax.random.normal(jax.random.PRNGKey(0), state.v.shape) * 0.2
    )
    a = jnp.asarray(np.array([[0.4, 0.2, -0.3, 0.05, 0.05, 0.05]] * B, np.float32))

    ref, _ = sim_x.step_batch(state, a)
    out, _ = sim_b.step_batch(state, a)
    assert np.abs(np.asarray(out.x) - np.asarray(ref.x)).max() < 1e-3
    assert np.isfinite(np.asarray(out.v)).all()

    def ga(sim):
        def loss(a):
            o, _ = sim.step_batch(state, a)
            return jnp.sum(o.x * jnp.cos(o.x))
        return np.asarray(jax.grad(loss)(a))

    gx, gb = ga(sim_x), ga(sim_b)
    cos = float((gx.ravel() @ gb.ravel())
                / (np.linalg.norm(gx) * np.linalg.norm(gb) + 1e-12))
    assert cos > 0.99, cos
    rel = float(np.linalg.norm(gb) / (np.linalg.norm(gx) + 1e-12))
    assert 0.9 < rel < 1.1, rel


def test_cloth_bf16_rejection_evidence():
    """bf16 cloth drifts far from the oracle — keep the rejection pinned."""
    from unidom_tpu.engine.cloth import ClothConf
    from unidom_tpu.envs.cloth_tasks import FoldCloth1Env

    def build(kernel_dtype, backend):
        conf = ClothConf(N=40, mem_saving_level=1, n_substeps=10,
                         gripper_radius=0.04, task="t", goal_path="",
                         backend=backend, kernel_dtype=kernel_dtype)
        return FoldCloth1Env(batch_size=2, conf=conf)

    env_x = build("f32", "xla")
    env_b = build("bf16", "pallas")
    _, state = env_x.reset(jax.random.PRNGKey(1))
    a = env_x.get_random_fold_action(state)
    _, _, _, ix = env_x.step_diff(a, state)
    _, _, _, ib = env_b.step_diff(a, state)
    diff = np.abs(np.asarray(ib["state"].x) - np.asarray(ix["state"].x)).max()
    assert np.isfinite(np.asarray(ib["state"].x)).all()
    # does not track the oracle (rejection evidence — see module docstring);
    # if a future variant fixes the cancellation this bound will trip
    assert diff > 0.01, f"bf16 cloth unexpectedly accurate ({diff}) — revisit!"
