"""Generate goal point clouds for every task env.

The reference ships hand-collected goals (a human clicking pick/place points
in an OpenCV UI, cloth_env.py:245-272). We regenerate equivalents:
- cloth tasks: *simulate* scripted folds through the differentiable env so
  goals are physically reachable states;
- unfold tasks: the flat cloth itself;
- MPM tasks: geometric target clouds (bent rope, shifted pour target,
  squashed slab) with the same particle densities the envs sample.

Run: python scripts/make_goals.py [task ...]  (default: all)
Writes unidom_tpu/assets/goals/<task>/goal.npy
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "unidom_tpu", "assets", "goals")


def save(task, pts):
    os.makedirs(os.path.join(ASSET, task), exist_ok=True)
    path = os.path.join(ASSET, task, "goal.npy")
    np.save(path, np.asarray(pts, np.float32))
    print(f"{task}: goal {pts.shape} -> {path}")


def _fold(env, state, pick, place):
    actions = jnp.asarray([[*pick, *place]], dtype=jnp.float32)
    _, _, _, info = env.step_diff(actions, state)
    return info["state"]


def cloth_goals():
    from unidom_tpu.envs.cloth_tasks import FoldCloth1Env, FoldCloth3Env, FoldTshirtEnv

    # fold_cloth1: fold left half onto right half
    env = FoldCloth1Env(batch_size=1)
    _, state = env.reset(jax.random.PRNGKey(0))
    x = np.asarray(env.packed_x(state))[0]
    zmin, zmax = x[:, 2].min(), x[:, 2].max()
    xmid = x[:, 0].mean()
    pick = [x[:, 0].mean(), 0, zmin]
    place = [x[:, 0].mean(), 0, zmax]
    state = _fold(env, state, pick, place)
    save("fold_cloth1", np.asarray(env.packed_x(state))[0])

    # fold_cloth3: three folds (z-half, then x-halves)
    env = FoldCloth3Env(batch_size=1)
    _, state = env.reset(jax.random.PRNGKey(0))
    x = np.asarray(env.packed_x(state))[0]
    state = _fold(env, state, [x[:, 0].mean(), 0, x[:, 2].min()],
                  [x[:, 0].mean(), 0, x[:, 2].max()])
    x = np.asarray(env.packed_x(state))[0]
    state = _fold(env, state, [x[:, 0].min(), 0, x[:, 2].mean()],
                  [x[:, 0].mean(), 0, x[:, 2].mean()])
    x = np.asarray(env.packed_x(state))[0]
    state = _fold(env, state, [x[:, 0].max(), 0, x[:, 2].mean()],
                  [x[:, 0].mean(), 0, x[:, 2].mean()])
    save("fold_cloth3", np.asarray(env.packed_x(state))[0])

    # unfold goals: the flat cloth
    env = FoldCloth1Env(batch_size=1)
    _, state = env.reset(jax.random.PRNGKey(0))
    flat = np.asarray(env.packed_x(state))[0]
    save("unfold_cloth1", flat)
    save("unfold_cloth3", flat)

    # tshirt: fold sleeves to center then bottom up (2 scripted folds)
    env = FoldTshirtEnv(batch_size=1)
    _, state = env.reset(jax.random.PRNGKey(0))
    x = np.asarray(env.packed_x(state))[0]
    cx, cz = x[:, 0].mean(), x[:, 2].mean()
    state = _fold(env, state, [x[:, 0].min(), 0, cz], [cx, 0, cz])
    x2 = np.asarray(env.packed_x(state))[0]
    state = _fold(env, state, [x2[:, 0].max(), 0, cz], [cx, 0, cz])
    save("fold_tshirt", np.asarray(env.packed_x(state))[0])


def rope_goals():
    """Bent-rope targets with the envs' own particle sampling."""
    from unidom_tpu.envs.mpm_tasks import ShapeRopeEnv

    env = ShapeRopeEnv.__new__(ShapeRopeEnv)  # only need the sampler params
    # sample the straight rope exactly as reset does, then bend into an L
    from unidom_tpu.engine.mpm import MPMSimulator
    from unidom_tpu.envs.mpm_tasks import ShapeRopeConf

    sim = MPMSimulator(ShapeRopeConf, 1)
    st = sim.add_box(None, size=ShapeRopeEnv.ROPE_WIDTH,
                     init_pos=ShapeRopeEnv.ROPE_INIT_POS, material=2, density=3.0)
    x = np.asarray(st.x)
    # bend: map arclength s in [-L/2, L/2] onto an L-shape corner at origin
    s = x[:, 0] - 0.5
    L = ShapeRopeEnv.ROPE_WIDTH[0]
    t = np.clip(s, 0, None)
    u = np.clip(-s, 0, None)
    gx = 0.45 + t
    gz = 0.45 + u
    goal = np.stack([gx, x[:, 1], gz], -1)
    save("shape_rope", goal)
    save("shape_rope_hard", goal)

    # whip_rope: rope swung to the +x side of the gripper
    from unidom_tpu.envs.mpm_tasks import WhipRopeConf

    sim = MPMSimulator(WhipRopeConf, 1)
    st = sim.add_box(None, size=(0.38, 0.006, 0.006), init_pos=(0.5, 0.01, 0.5),
                     z_rotation_angle=np.pi / 2, material=1, density=2.75)
    x = np.asarray(st.x)
    goal = x.copy()
    goal[:, 0] += 0.15  # displaced sideways
    save("whip_rope", goal)


def pour_goals():
    from unidom_tpu.engine.mpm import MPMSimulator
    from unidom_tpu.envs.mpm_tasks import PourSoupConf, PourSoupEnv, PourWaterConf, PourWaterEnv

    # water resettled inside the target bowl (bowl1 at [0.5, 0.06, 0.3])
    sim = MPMSimulator(PourWaterConf, 1)
    st = sim.add_box(None, size=[0.07, 0.07, 0.07], init_pos=[0.5, 0.2, 0.5],
                     material=0, density=4.0, key=jax.random.PRNGKey(0))
    x = np.asarray(st.x)
    x = x - np.array([0.5, 0.2, 0.5])
    x[:, 1] *= 0.5  # settled: flattened
    goal = x + np.array([0.5, 0.055, 0.3])
    save("pour_water", goal)

    env_cloud = []
    sim = MPMSimulator(PourSoupConf, 1)
    st = sim.add_box(None, size=[0.07, 0.07, 0.07], init_pos=[0.5, 0.2, 0.5],
                     material=0, density=4.0, key=jax.random.PRNGKey(0))
    st = sim.add_box(st, size=[0.03, 0.03, 0.03], init_pos=[0.47, 0.2, 0.5],
                     material=1, density=2.0)
    st = sim.add_box(st, size=[0.03, 0.03, 0.03], init_pos=[0.5, 0.2, 0.55],
                     material=1, density=2.0)
    from unidom_tpu.envs.mpm_tasks import _veg_point_cloud

    x = np.concatenate([np.asarray(st.x), _veg_point_cloud()], 0)
    x = x - np.array([0.5, 0.2, 0.5])
    x[:, 1] *= 0.5
    goal = x + np.array([0.5, 0.055, 0.3])
    save("pour_soup", goal)


def elasto_goal():
    from unidom_tpu.engine.mpm import MPMSimulator
    from unidom_tpu.envs.mpm_tasks import ShapeElastoPlasticConf, ShapeElastoPlasticEnv

    sim = MPMSimulator(ShapeElastoPlasticConf, 1)
    st = sim.add_box(None, size=ShapeElastoPlasticEnv.ROPE_WIDTH,
                     init_pos=ShapeElastoPlasticEnv.ROPE_INIT_POS,
                     material=2, density=3.0)
    x = np.asarray(st.x)
    c = x.mean(0)
    goal = (x - c) * np.array([1.3, 0.6, 1.3]) + c  # squashed outward
    goal[:, 1] = np.clip(goal[:, 1], 0.005, None)
    save("shape_elasto_plastic", goal)


ALL = {
    "cloth": cloth_goals,
    "rope": rope_goals,
    "pour": pour_goals,
    "elasto": elasto_goal,
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    for w in which:
        ALL[w]()
