"""Golden-trajectory regression against the reference's recorded rollouts.

Fixtures under tests/fixtures/ are decoded from the reference's own data
(scripts/extract_reference_fixtures.py):

- fold_cloth1_demo*.npz — human expert demos recorded through the reference
  engine (DaXBench expert_demo/fold_cloth1/demo_*.pkl; collection loop at
  cloth_env.py:274-321). The ``state`` entries are the engine states
  *before* each pick-and-place action, so x[0] is the reset state and
  x[t>0] is the cloth after replaying actions[:t].
- calibration_rope_*.npz — real-robot rope point clouds around one
  pick-and-place push (exp/calibration_data/*.pkl, used by
  exp/calibrate.py:65-166).

Replaying the same raw pnp actions through this engine must land on the
reference's recorded particle clouds: that pins the full contract chain
(reset geometry, pnp 40-sub-action expansion, 50-substep spring physics,
friction, grippers) to the reference numerically, not just structurally.
"""

import os

import jax
import numpy as np
import pytest

import unidom_tpu
from unidom_tpu.ops.metrics import chamfer

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    path = os.path.join(FIXTURES, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} not extracted")
    return np.load(path)


@pytest.mark.parametrize("idx", [0, 1])
def test_fold_cloth1_demo_replay(idx):
    demo = _load(f"fold_cloth1_demo{idx}.npz")
    actions, ref_x = demo["actions"], demo["x"]

    env = unidom_tpu.make_env("fold_cloth1", batch_size=1, seed=0)
    _, state = env.reset(jax.random.PRNGKey(0))

    # reset geometry: same flat cloth, same packed ordering, up to the
    # reference's random global xz offset (cloth_env.py:181-183 adds
    # normal(key,(2,))*0.05 per reset). De-mean to compare shape, then
    # translate our state onto the recorded offset so the recorded world-
    # coordinate pnp actions apply identically.
    ours = np.asarray(env.packed_x(state))[0]
    assert ours.shape == ref_x[0].shape
    np.testing.assert_allclose(
        ours - ours.mean(0), ref_x[0] - ref_x[0].mean(0), atol=1e-5
    )
    delta = (ref_x[0].mean(0) - ours.mean(0)).astype(np.float32)
    state = state._replace(x=state.x + delta)
    np.testing.assert_allclose(
        np.asarray(env.packed_x(state))[0], ref_x[0], atol=1e-5
    )

    # replay the expert actions; each recorded state is pre-action, so
    # after applying actions[t] we must match ref_x[t + 1]
    step = jax.jit(env.step_diff)
    for t in range(actions.shape[0] - 1):
        act = actions[t : t + 1].astype(np.float32)
        _, _, _, info = step(act, state)
        state = info["state"]
        ours = np.asarray(env.packed_x(state))[0]
        d = float(chamfer(ours[None], ref_x[t + 1])[0])
        # the engines share operator semantics but not layout / summation
        # order / friction branch tie-breaks; 2000 contact-rich substeps per
        # action amplify f32 noise to ~half a particle spacing (measured
        # 0.005-0.007). A broken contract (pnp expansion, friction sign,
        # gripper suction) lands >= 0.05, so 0.01 separates drift from bugs.
        assert d < 1e-2, (t, d)


def test_fold_cloth1_demo_obs_contract():
    demo = _load("fold_cloth1_demo0.npz")
    env = unidom_tpu.make_env("fold_cloth1", batch_size=1, seed=0)
    _, state = env.reset(jax.random.PRNGKey(0))
    obs = np.asarray(env.get_obs(state))
    assert obs.shape[-1] == demo["obs"].shape[-1] == 1544
    # particle block of the observation matches the recorded reset obs up
    # to the reference's random global reset offset (cloth_env.py:181-183)
    ref_particles = demo["obs"][0][: 512 * 3].reshape(512, 3)
    ours = obs[0][: 512 * 3].reshape(512, 3)
    np.testing.assert_allclose(
        ours - ours.mean(0), ref_particles - ref_particles.mean(0), atol=1e-5
    )


def test_calibration_rope_replay():
    """Sim-vs-real: replay the recorded pick-and-place push from the real
    rope pose and check the simulated rope tracks the real after-cloud
    (exp/calibrate.py semantics: init from endpoints, replay, compare)."""
    fix = _load("calibration_rope_0.npz")
    from unidom_tpu.serve.calibrate import replay_episode

    result = replay_episode(
        before=fix["before"], after=fix["after"],
        pick=fix["pick"], place=fix["place"],
    )
    # the real clouds are dense scans (~1k points) of a ~0.5 m rope; the
    # simulated rope must end closer to the real after-state than it began
    assert result["chamfer_after"] < result["chamfer_before"], result
    assert np.isfinite(result["chamfer_after"])


def test_goal_assets_match_reference():
    """The shipped goal clouds ARE the reference's task definitions
    (adopted verbatim by scripts/adopt_goals.py; round-2 verdict found
    regenerated goals made every reward number incomparable). shape_rope_hard
    trains against the shape_rope goal, as the reference env does
    (shape_rope_hard_env.py:8 aliases ShapeRopeEnv's conf, task="shape_rope").
    """
    ref_root = "/root/reference/DaXBench/daxbench/core/envs/goals"
    if not os.path.isdir(ref_root):
        pytest.skip("reference tree not mounted")
    asset_root = os.path.join(
        os.path.dirname(unidom_tpu.__file__), "assets", "goals"
    )
    adopted = {
        "fold_cloth1": "fold_cloth1",
        "fold_cloth3": "fold_cloth3",
        "fold_tshirt": "fold_tshirt",
        "unfold_cloth1": "unfold_cloth1",
        "unfold_cloth3": "unfold_cloth3",
        "whip_rope": "whip_rope",
        "shape_rope": "shape_rope",
        "shape_rope_hard": "shape_rope",
        "pour_water": "pour_water",
    }
    for task, ref_task in adopted.items():
        ours = np.load(os.path.join(asset_root, task, "goal.npy"))
        ref = np.load(os.path.join(ref_root, ref_task, "goal.npy"))
        np.testing.assert_array_equal(ours, ref, err_msg=task)
