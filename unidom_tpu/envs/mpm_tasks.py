"""Concrete MPM task environments.

Parity targets (DaXBench/daxbench/core/envs/):
- whip_rope (whip_rope_env.py:27-268): position-controlled gripper whipping
  an elastic rope; n_grid 64, dt 1e-4, 70 substeps/action, 70 macro steps.
- shape_rope / shape_rope_hard (shape_rope_env.py:27-278,
  shape_rope_hard_env.py): push a sigma-clip-plastic rope on a 128 grid with
  a (64, 6, 64) focus region; push macro action capped at 0.3 length over 30
  substeps; "hard" = 8 extra scrambling pushes at reset.
- pour_water (pour_water_env.py:28-181): near-incompressible liquid
  (E=5e-5, nu=0.4999) in a bowl-SDF primitive pair, 100 macro steps.
- pour_soup (pour_soup_env.py:29-181): water + two elastic tofu cubes +
  vegetable point cloud (procedurally sampled ellipsoid here instead of the
  .pcd asset), two bowls.
- shape_elasto_plastic (shape_elasto_plastic.py:23-160): plastic slab on a
  96 grid, 16 substeps, push cap 0.1 over 20 substeps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.engine.mpm import ELASTIC, PLASTIC_CLIP, WATER, MPMConf, MPMState
from unidom_tpu.envs.base_mpm import MPMEnv

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets")


def _goal(task):
    return os.path.join(ASSET_DIR, "goals", task, "goal.npy")


# ------------------------------------------------------------------ #
# whip_rope
# ------------------------------------------------------------------ #

WhipRopeConf = MPMConf(
    n_grid=64,
    dt=1e-4,
    steps=70,  # 0.007 s / 1e-4
    E=100.0,
    nu=0.1,
    ground_friction=0.1,
    res=(32, 32, 32),
    n_primitive=1,
    task="whip_rope",
    goal_path=_goal("whip_rope"),
)


class WhipRopeEnv(MPMEnv):
    ROPE_WIDTH = (0.38, 0.006, 0.006)
    ROPE_INIT_POS = (0.5, 0.01, 0.5)

    def __init__(self, batch_size, seed=1, max_steps=70, conf=None, aux_reward=False, **kw):
        conf = conf or WhipRopeConf
        super().__init__(
            conf, batch_size, max_steps, seed,
            focus_computation=True, use_position_control=True,
        )

    @staticmethod
    def process_pre_step_actions(actions, shift):
        return actions

    @staticmethod
    @jax.vmap
    def auto_reset(state, state_new, key):
        init_pos = state.primitives[0].position[0]
        key, _ = jax.random.split(key)
        shift = jax.random.normal(key, (2,)) * 0.02
        init_pos = init_pos.at[jnp.array([0, 2])].add(shift)
        position = state.primitives[0].position.at[0].set(init_pos)
        prims = (state.primitives[0]._replace(position=position),) + tuple(state.primitives[1:])
        state = state._replace(
            primitives=prims,
            x=state.x.at[:, jnp.array([0, 2])].add(shift[None, :]),
            key=key,
        )
        return state

    @staticmethod
    @jax.vmap
    def get_primitive_actions(actions, state: MPMState):
        actions = actions + 1e-12  # reference nan hack (whip_rope_env.py:112)
        actions = actions / 50.0
        actions = actions.at[3:].set(0.0)
        return actions[None, :], state

    def reset(self, key):
        self.clean_up_b4_reset()
        state = self.simulator.add_box(
            state=None, hardness=1.0, size=self.ROPE_WIDTH,
            init_pos=self.ROPE_INIT_POS, z_rotation_angle=np.pi / 2,
            material=ELASTIC, density=2.75,
        )
        state = self.create_primitive(
            state, friction=0.1, color=[0.5, 0.5, 0.5],
            size=[0.02, 0.02, 0.02], init_pos=[0.5, 0.01, 0.3], sdf_name="box",
        )
        self.initialize_after_adding_particle_primitives(state)
        self.state = self.auto_reset(self.init_state, self.init_state, self.init_state.key)
        return self.get_obs(self.state), self.state


def grad_test(env=None, n_chained_steps=5, n_iters=3):
    """Gradient sanity check (whip_rope_env.py:213-252 parity, scripted
    actions instead of the keyboard UI): jit jax.grad through
    ``n_chained_steps`` chained step_diff calls with per-step NaN scrubs and
    assert the gradients are finite and nonzero."""
    import numpy as _np

    from unidom_tpu.ops.gradops import scrub_grad

    env = env or WhipRopeEnv(
        batch_size=1, seed=1, max_steps=n_chained_steps + 1,
        conf=MPMConf(n_grid=32, dt=2e-4, steps=8, E=100.0, nu=0.1,
                     res=(16, 16, 16), task="grad_test", goal_path=""),
    )
    _, first_state = env.reset(jax.random.PRNGKey(1))

    def loss_fn(actions, state):
        def step_(i, carry):
            actions, state = carry
            state = jax.tree_util.tree_map(
                lambda t: scrub_grad(t) if t.dtype == jnp.float32 else t, state
            )
            actions = scrub_grad(actions)
            _, _, _, info = env.step_diff(actions, state)
            return (actions, info["state"])

        actions, state = jax.lax.fori_loop(0, n_chained_steps, step_, (actions, state))
        return state.x.sum(), state

    loss_grad = jax.jit(jax.grad(loss_fn, has_aux=True))
    state = first_state
    results = []
    for i in range(n_iters):
        actions = jnp.asarray(
            _np.array([[0.3, 0.0, 0.5, 0.0, 0.0, 0.0]]), jnp.float32
        ).repeat(env.batch_size, 0)
        g, state = loss_grad(actions, state)
        g = _np.asarray(g)
        assert _np.isfinite(g).all(), f"non-finite grad at iter {i}"
        results.append(g)
        print(f"grad_test iter {i}: grad {g.round(6)}")
    assert any(_np.abs(r).sum() > 0 for r in results), "all-zero gradients"
    return results


# ------------------------------------------------------------------ #
# shape_rope family
# ------------------------------------------------------------------ #

ShapeRopeConf = MPMConf(
    n_grid=128,
    dt=0.5e-4,
    steps=133,  # 0.2 s / 30 actions / 0.5e-4 (reference primitive_action_duration)
    E=100.0,
    nu=0.1,
    ground_friction=0.9,
    res=(64, 6, 64),
    n_primitive=1,
    primitive_action_steps=30,
    task="shape_rope",
    goal_path=_goal("shape_rope"),
)


class ShapeRopeEnv(MPMEnv):
    """Push-to-shape a plastic rope. Macro action = (start, end) push."""

    # the reference treats shape_rope like a cloth env in the trainer
    # (sigmoid squash, host reset; apg.py:90-91,133-134)
    action_squash = "sigmoid"
    reset_mode = "host_reset"

    PUSH_SUBSTEPS = 30
    PUSH_CAP = 0.3
    ROPE_WIDTH = (0.25, 0.006, 0.006)
    ROPE_INIT_POS = (0.5, 0.01, 0.5)
    ROPE_MATERIAL = PLASTIC_CLIP
    ROPE_DENSITY = 3.0
    PRIM_SIZE = (0.015, 0.06, 0.015)
    PRIM_INIT = (0.5, 0.01, 0.45)
    DO_RESET_PUSHES = 2

    def __init__(self, batch_size, seed=1, max_steps=6, conf=None, aux_reward=False, **kw):
        conf = conf or ShapeRopeConf
        super().__init__(conf, batch_size, max_steps, seed, focus_computation=True)
        self.aux_reward = aux_reward

    @staticmethod
    @jax.vmap
    def auto_reset(state, state_new, key):
        return state_new

    @staticmethod
    def process_pre_step_actions(actions, shift):
        actions = actions.at[..., 0:3].add(shift)
        actions = actions.at[..., 3:].add(shift)
        return actions

    @classmethod
    def _push_actions(cls, actions, state: MPMState):
        start, end = actions[:3], actions[3:]
        start = start.at[1].set(0.01)
        end = end.at[1].set(0.01)
        norm = jnp.linalg.norm(end - start) + 1e-8
        vec = (end - start) / norm
        scale = norm.clip(0.0, cls.PUSH_CAP)
        end = start + vec * scale

        p0 = state.primitives[0]
        position = p0.position.at[0].set(start)
        prims = (p0._replace(position=position),) + tuple(state.primitives[1:])
        state = state._replace(primitives=prims)

        n_sub = cls.PUSH_SUBSTEPS
        act_push = jnp.broadcast_to((end - start) / n_sub, (n_sub, 3))
        act_push = act_push.at[:, 1].set(0.0)
        sub = jnp.concatenate([act_push, jnp.zeros((n_sub, 3))], axis=-1)
        return sub, state

    def get_primitive_actions(self, actions, state):
        return jax.vmap(self._push_actions)(actions, state)

    def random_policy(self, n_actions, radius=0.05):
        pc = np.asarray(self.state.x[0])
        p_ids = np.random.randint(0, pc.shape[0], n_actions)
        angles = np.random.random((n_actions,)) * np.pi * 2
        end = pc[p_ids].copy()
        end[:, 0] += np.cos(angles) * radius
        end[:, 2] += np.sin(angles) * radius
        start = pc[p_ids].copy()
        start[:, 0] -= np.cos(angles) * radius
        start[:, 2] -= np.sin(angles) * radius
        return np.concatenate([start, end], axis=-1)

    def random_push(self, step=10):
        for _ in range(step):
            actions = self.random_policy(self.batch_size)
            actions[:, 1] = 0
            _, _, _, info = self.step_diff(jnp.asarray(actions), self.state)
            self.state = info["state"]
        self.state = self.state._replace(cur_step=jnp.zeros_like(self.state.cur_step))

    def reset(self, key):
        self.clean_up_b4_reset()
        state = self.simulator.add_box(
            state=None, hardness=1.0, size=self.ROPE_WIDTH,
            init_pos=self.ROPE_INIT_POS, z_rotation_angle=0.0,
            material=self.ROPE_MATERIAL, density=self.ROPE_DENSITY,
        )
        state = self.create_primitive(
            state, friction=0.1, color=[0.5, 0.5, 0.5],
            size=self.PRIM_SIZE, init_pos=self.PRIM_INIT, sdf_name="box",
        )
        self.initialize_after_adding_particle_primitives(state)
        if self.DO_RESET_PUSHES:
            self.random_push(step=self.DO_RESET_PUSHES)
        else:
            self.state = self.init_state
        return self.get_obs(self.state), self.state


class ShapeRopeHardEnv(ShapeRopeEnv):
    def __init__(self, batch_size, seed=1, max_steps=20, conf=None, aux_reward=False, **kw):
        conf = conf or MPMConf(**{**ShapeRopeConf.__dict__, "task": "shape_rope_hard",
                                  "goal_path": _goal("shape_rope_hard")})
        super().__init__(batch_size, seed, max_steps, conf, aux_reward)

    def reset(self, key):
        super().reset(key)
        self.random_push(step=8)
        return self.get_obs(self.state), self.state


# ------------------------------------------------------------------ #
# pour_water / pour_soup
# ------------------------------------------------------------------ #

PourWaterConf = MPMConf(
    n_grid=80,
    dt=3e-4,
    steps=23,  # 0.007 s / 3e-4
    E=5e-5,
    nu=0.4999,
    ground_friction=0.1,
    res=(26, 20, 26),  # n_grid//3, n_grid//4, n_grid//3
    n_primitive=2,
    task="pour_water",
    goal_path=_goal("pour_water"),
)


class PourWaterEnv(MPMEnv):
    BOWL0 = dict(size=(0.09, 0.0, 0.008), init_pos=(0.5, 0.2, 0.5))
    BOWL1 = dict(size=(0.08, 0.0, 0.008), init_pos=(0.5, 0.06, 0.3))

    def __init__(self, batch_size, seed=1, max_steps=100, conf=None, aux_reward=False, **kw):
        conf = conf or PourWaterConf
        super().__init__(conf, batch_size, max_steps, seed, focus_computation=True)

    @staticmethod
    @jax.vmap
    def get_primitive_actions(actions, state):
        actions = jnp.concatenate([actions, jnp.zeros_like(actions)])
        actions = actions[None, :]
        actions = actions.at[..., :3].set(actions[..., :3] / 500.0)
        actions = actions.at[..., 3:6].set(actions[..., 3:6] / 500.0)
        actions = actions + 1e-12
        actions = actions.at[..., 1].set(0.0)
        return actions, state

    @staticmethod
    def process_pre_step_actions(actions, shift):
        return actions

    @staticmethod
    @jax.vmap
    def auto_reset(state, state_new, key):
        init_pos = jnp.array([0.5, 0.2, 0.5])
        key, _ = jax.random.split(key)
        init_pos = init_pos.at[jnp.array([0, 2])].add(jax.random.normal(key, (2,)) * 0.02)
        position = state.primitives[0].position.at[0].set(init_pos)
        prims = (state.primitives[0]._replace(position=position),) + tuple(state.primitives[1:])
        return state._replace(primitives=prims, key=key)

    def _add_contents(self, state):
        return self.simulator.add_box(
            state=state, hardness=1.0, size=[0.07, 0.07, 0.07],
            init_pos=[0.5, 0.2, 0.5], material=WATER, density=4.0,
        )

    def reset(self, key):
        self.clean_up_b4_reset()
        state = self._add_contents(None)
        state = self.create_primitive(
            state, friction=0.1, color=[0.5, 0.5, 0.5], softness=666.0,
            sdf_name="container", **self.BOWL0,
        )
        state = self.create_primitive(
            state, friction=0.1, color=[0.5, 0.5, 0.5], softness=666.0,
            sdf_name="container", **self.BOWL1,
        )
        self.initialize_after_adding_particle_primitives(state)
        self.state = self.auto_reset(self.init_state, self.init_state, self.init_state.key)
        return self.get_obs(self.state), self.state


PourSoupConf = MPMConf(
    n_grid=128,
    dt=4e-4,
    steps=25,  # 0.01 s / 4e-4
    E=100.0,
    nu=0.1,
    ground_friction=0.1,
    res=(128, 64, 128),
    n_primitive=2,
    task="pour_soup",
    goal_path=_goal("pour_soup"),
)


def _veg_point_cloud(n=160, seed=7):
    """The reference's vegetable point cloud (pour_soup_env.py:152-160:
    model.pcd -> voxel_down_sample(0.5) -> center, /400, +[0.55,0.2,0.5]),
    adopted via scripts/adopt_assets.py (4131 points). Procedural ellipsoid
    fallback only if the adopted asset is missing."""
    asset = os.path.join(ASSET_DIR, "pour_soup_veg.npy")
    if os.path.exists(asset):
        return np.load(asset)
    rng = np.random.RandomState(seed)
    pts = rng.normal(size=(n, 3)) * np.array([0.015, 0.006, 0.015])
    return pts + np.array([0.55, 0.2, 0.5])


class PourSoupEnv(PourWaterEnv):
    def __init__(self, batch_size, seed=1, max_steps=120, conf=None, aux_reward=False, **kw):
        conf = conf or PourSoupConf
        MPMEnv.__init__(self, conf, batch_size, max_steps, seed, focus_computation=True)

    def _add_contents(self, state):
        state = self.simulator.add_box(
            state=state, hardness=1.0, size=[0.07, 0.07, 0.07],
            init_pos=[0.5, 0.2, 0.5], material=WATER, density=4.0,
        )
        state = self.simulator.add_box(
            state=state, hardness=0.3, size=[0.03, 0.03, 0.03],
            init_pos=[0.47, 0.2, 0.5], material=ELASTIC, density=2.0,
        )
        state = self.simulator.add_box(
            state=state, hardness=0.3, size=[0.03, 0.03, 0.03],
            init_pos=[0.5, 0.2, 0.55], material=ELASTIC, density=2.0,
        )
        state = self.simulator.add_points(
            state, _veg_point_cloud(), hardness=0.3, material=ELASTIC
        )
        return state


# ------------------------------------------------------------------ #
# shape_elasto_plastic
# ------------------------------------------------------------------ #

ShapeElastoPlasticConf = MPMConf(
    n_grid=96,
    dt=2e-4,
    steps=16,
    E=2.0,
    nu=0.2,
    ground_friction=2.0,
    res=(48, 32, 48),
    n_primitive=1,
    task="shape_elasto_plastic",
    goal_path=_goal("shape_elasto_plastic"),
)


class ShapeElastoPlasticEnv(ShapeRopeEnv):
    PUSH_SUBSTEPS = 20
    PUSH_CAP = 0.1
    ROPE_WIDTH = (0.2, 0.06, 0.12)
    ROPE_INIT_POS = (0.5, 0.07, 0.5)
    ROPE_MATERIAL = PLASTIC_CLIP
    ROPE_DENSITY = 3.0
    DO_RESET_PUSHES = 0

    def __init__(self, batch_size, seed=1, max_steps=6, conf=None, aux_reward=False, **kw):
        conf = conf or ShapeElastoPlasticConf
        super().__init__(batch_size, seed, max_steps, conf, aux_reward)
