"""PlasticineLab-style task family: declarative MPM scenes with target-driven
losses.

Reference: the plb scene configs (GenORM/policy/pbm/plb/envs/{move,rope,
table,torus}.yml) loaded by TaichiEnv (plb/engine/taichi_env.py:9-141) —
one von-Mises plastic body, sphere manipulators with per-step velocity
actions, and a target density grid scored by the sdf/density/contact loss
(plb/engine/losses/loss.py). Episode bookkeeping (reward = loss decrease,
incremental IoU) follows plb exactly via engine/losses.LossTracker.

Targets are synthesized per variant (the reference ships .npy asset grids):
variant v translates the initial body by a deterministic per-variant offset.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.engine.losses import LossTracker, LossWeights, TargetLoss
from unidom_tpu.engine.mpm import VON_MISES, MPMConf
from unidom_tpu.envs.base_mpm import MPMEnv

PLB_BASE_CONF = MPMConf(
    n_grid=64,
    dt=0.5e-4,
    steps=40,  # plb: substeps = 2e-3 // dt
    E=5e3,
    nu=0.2,
    yield_stress=1762.2,
    ground_friction=0.5,
    res=(64, 64, 64),
    gravity=(0.0, -0.4, 0.0),
    task="plb",
    goal_path="",
)

PLB_SCENES = {
    "plb_move": dict(
        shapes=[dict(width=(0.5, 0.028, 0.028), init_pos=(0.5, 0.0125, 0.5), n=1000)],
        primitives=[dict(radius=0.025, init_pos=(0.745, 0.02, 0.5), scale=0.005)],
        target_shift=(0.0, 0.0, 0.12),
    ),
    "plb_rope": dict(
        shapes=[dict(width=(0.4, 0.01, 0.4), init_pos=(0.5, 0.04, 0.5), n=1500)],
        primitives=[dict(radius=0.025, init_pos=(0.5, 0.05, 0.5), scale=0.005)],
        target_shift=(0.1, 0.0, 0.0),
    ),
    "plb_table": dict(
        shapes=[dict(width=(0.4, 0.01, 0.4), init_pos=(0.5, 0.01, 0.5), n=1500)],
        primitives=[dict(radius=0.035, init_pos=(0.65, 0.025, 0.35), scale=0.005)],
        target_shift=(0.0, 0.0, 0.1),
    ),
    "plb_torus": dict(
        shapes=[dict(width=(0.028, 0.5, 0.028), init_pos=(0.5, 0.3, 0.5), n=1000)],
        primitives=[
            dict(radius=0.025, init_pos=(0.475, 0.05, 0.5), scale=1.0, friction=0.9),
            dict(radius=0.025, init_pos=(0.5, 0.55, 0.5), scale=1.0, friction=0.9),
        ],
        target_shift=(0.0, -0.2, 0.0),
    ),
}


class PlbSceneEnv(MPMEnv):
    """Declarative plb scene: shapes + sphere manipulators + target loss.

    Macro action = per-primitive velocity (3 dof each, plb action scale),
    driving ``conf.steps`` substeps. Reward follows plb's
    ``compute_loss`` bookkeeping (loss decrease vs start)."""

    action_squash = None
    reset_mode = "host_reset"

    def __init__(self, scene_name, batch_size, seed=1, max_steps=50, conf=None,
                 variant=1, aux_reward=False, **kw):
        self.scene = PLB_SCENES[scene_name]
        self.variant = variant
        conf = conf or replace(
            PLB_BASE_CONF,
            n_primitive=len(self.scene["primitives"]),
            task=scene_name,
        )
        super().__init__(conf, batch_size, max_steps, seed,
                         focus_computation=False, use_position_control=False)
        self.action_size = 3 * len(self.scene["primitives"])
        self.target_loss = None  # built at reset

    # ---------------- scene building ---------------- #

    def _sample_shape(self, spec, rng):
        w = np.asarray(spec["width"]) * 0.5
        pts = rng.uniform(-1, 1, (spec["n"], 3)) * w + np.asarray(spec["init_pos"])
        return pts.astype(np.float32)

    def reset(self, key):
        self.clean_up_b4_reset()
        rng = np.random.RandomState(int(np.asarray(jax.random.key_data(key)).ravel()[-1] % (2**31)))

        state = None
        all_pts = []
        for spec in self.scene["shapes"]:
            pts = self._sample_shape(spec, rng)
            all_pts.append(pts)
            state = self.simulator.add_points(state, pts, hardness=1.0,
                                              material=VON_MISES)
        for p in self.scene["primitives"]:
            state = self.create_primitive(
                state, friction=p.get("friction", 0.9), color=[0.7, 0.7, 0.7],
                size=[p["radius"], 0.0, 0.0], init_pos=p["init_pos"],
                softness=666.0, sdf_name="sphere",
            )
        self.initialize_after_adding_particle_primitives(state)

        # per-variant synthesized target grid (reference asset .npy stand-in)
        shift = np.asarray(self.scene["target_shift"]) * (
            1.0 + 0.1 * (self.variant - 1)
        )
        target_pts = np.concatenate(all_pts) + shift
        self.target_loss = TargetLoss.from_particles(
            jnp.asarray(np.clip(target_pts, 0.01, 0.99)),
            self.conf.res, self.conf.inv_dx,
            weights=LossWeights(),
        )
        info0 = jax.vmap(lambda x: self.target_loss.losses(x))(self.state.x)
        self.tracker = LossTracker.init(
            jax.tree_util.tree_map(lambda t: t, info0)
        )
        # plb reward replaces the L2 goal reward
        self.goal = jnp.zeros((1, 3))
        return self.get_obs(self.state), self.state

    # ---------------- actions / reward ---------------- #

    def get_primitive_actions(self, actions, state):
        scales = jnp.concatenate(
            [jnp.full((3,), p["scale"]) for p in self.scene["primitives"]]
        )

        def one(a, s):
            a = a * scales
            full = jnp.concatenate(
                [
                    jnp.concatenate([a[i * 3 : (i + 1) * 3], jnp.zeros(3)])
                    for i in range(len(self.scene["primitives"]))
                ]
            )
            return full[None, :], s

        return jax.vmap(one)(actions, state)

    @staticmethod
    def process_pre_step_actions(actions, shift):
        return actions

    @staticmethod
    def auto_reset(state, state_new, key):
        return state_new

    def reward_func(self, state, goal):
        """plb reward: decrease of the target loss vs episode start
        (loss.py compute_loss:288-302)."""
        info = jax.vmap(lambda x: self.target_loss.losses(x))(state.x)
        return self.tracker.start_loss - info["loss"]

    def loss_info(self, state):
        info = jax.vmap(lambda x: self.target_loss.losses(x))(state.x)
        self.tracker, out = self.tracker.step(info)
        return out


def make_plb_env(scene_name):
    class _Env(PlbSceneEnv):
        def __init__(self, batch_size, **kw):
            super().__init__(scene_name, batch_size, **kw)

    _Env.__name__ = f"PlbEnv_{scene_name}"
    return _Env
