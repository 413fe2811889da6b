"""MPM task environment base: macro actions -> substep scan, L2 reward,
focus-region re-centering, auto-reset.

Semantics follow DaXBench/daxbench/core/envs/basic/mpm_env.py:18-237,
including the "focus computation" trick (the docs' *Lazy Dynamic Update*):
before each macro step the particle cloud and primitives are shifted so the
action region is centered in a small simulation grid ``res`` (<< full
n_grid^3), and shifted back afterwards — the grid work per substep shrinks
by the volume ratio.
"""

import math
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.engine.mpm import MPMConf, MPMSimulator, MPMState
from unidom_tpu.engine.primitives import create_primitive
from unidom_tpu.ops.metrics import l2_distance


def _right_broadcast(arr, target):
    return arr.reshape(arr.shape + (1,) * (target.ndim - arr.ndim))


class MPMEnv:
    PARTICLE = "PARTICLE"
    DEPTH = "DEPTH"

    # trainer contracts (replacing the reference's isinstance switches)
    action_squash = None
    reset_mode = "auto_reset"  # randomize around init_state each iteration

    def __init__(
        self,
        conf: MPMConf,
        batch_size: int,
        max_steps: int,
        seed: int,
        focus_computation: bool = False,
        use_position_control: bool = False,
    ):
        self.conf = conf
        self.simulator = MPMSimulator(conf, batch_size, use_position_control)
        self.aux_reward = False
        self.max_steps = max_steps
        self.batch_size = batch_size
        self.action_size = 6
        self.focus_computation = focus_computation
        self.seed(seed)

        self.state = None
        self.init_state = None
        self.observation_size = 0

        self.goal = self._load_goal(conf.goal_path)
        self.step_diff = jax.jit(self.build_step_diff())

    def seed(self, seed):
        self.simulator.key_global = jax.random.PRNGKey(seed)
        np.random.seed(seed)

    def _load_goal(self, goal_path):
        if goal_path and os.path.exists(goal_path):
            return jnp.asarray(np.load(goal_path))
        if goal_path:  # silent when no goal was requested: stdout is the
            # bench JSON contract on library/driver paths.
            print(f"Warning: goal file {goal_path!r} does not exist!", file=sys.stderr)
        return jnp.zeros((1, 3))

    # -------------------------------------------------------------- #
    # per-task hooks
    # -------------------------------------------------------------- #

    def get_primitive_actions(self, actions, state):
        """(B, 6) macro action -> ((B, n_sub, 6 n_prim) sub-actions, state)."""
        raise NotImplementedError

    @staticmethod
    def process_pre_step_actions(actions, shift):
        raise NotImplementedError

    @staticmethod
    def auto_reset(state, state_new, key):
        raise NotImplementedError

    def reset(self, key):
        raise NotImplementedError

    def reward_func(self, state, goal):
        l2 = l2_distance(state.x, goal)
        return math.e ** (-l2 * 10.0)

    # -------------------------------------------------------------- #
    # observations
    # -------------------------------------------------------------- #

    def get_obs(self, state: MPMState):
        def one(x, v, prim_pos):
            return jnp.concatenate([x.reshape(-1), v.reshape(-1), prim_pos.reshape(-1)])

        return jax.vmap(one)(state.x, state.v, state.primitives[0].position)

    # -------------------------------------------------------------- #
    # step
    # -------------------------------------------------------------- #

    def build_step_diff(self):
        conf = self.conf

        def pre_step(actions, state: MPMState):
            # center the cloud in the focus grid (mpm_env.py:99-114)
            state_center = state.x.mean(1)
            target_center = jnp.array(conf.res) * 0.5 / conf.n_grid
            shift = target_center - state_center
            shift = shift.at[:, 1].set(0.0)

            actions = self.process_pre_step_actions(actions, shift)

            shift_b = shift[:, None, :]
            prims = tuple(
                p._replace(position=p.position + shift_b) for p in state.primitives
            )
            state = state._replace(x=state.x + shift_b, primitives=prims)
            return actions, state, shift_b

        def post_step(state, state_list, shift_b):
            prims = tuple(
                p._replace(position=p.position - shift_b) for p in state.primitives
            )
            state = state._replace(x=state.x - shift_b, primitives=prims)
            prims_l = tuple(
                p._replace(position=p.position - shift_b[None, ...])
                for p in state_list.primitives
            )
            state_list = state_list._replace(
                x=state_list.x - shift_b[None, ...], primitives=prims_l
            )
            return state, state_list

        def step_diff(actions, state: MPMState):
            pickup_place = actions[..., :3]
            contact_distance = jnp.sqrt(
                jnp.sum((pickup_place[:, None, :] - state.x) ** 2, -1)
            ).min(-1)

            if self.focus_computation:
                actions, state, shift_b = pre_step(actions, state)
            actions, state = self.get_primitive_actions(actions, state)
            actions = actions.swapaxes(0, 1)  # (n_sub, B, 6 n_prim)

            state, state_list = jax.lax.scan(
                self.simulator.step_batch, state, actions, length=actions.shape[0]
            )
            state = state._replace(cur_step=state.cur_step + 1)

            if self.focus_computation:
                state, state_list = post_step(state, state_list, shift_b)

            done = state.cur_step >= self.max_steps

            # scrub before reward (mpm_env.py:150-154)
            state = state._replace(
                x=jnp.nan_to_num(state.x),
                v=jnp.nan_to_num(state.v),
                C=jnp.nan_to_num(state.C),
                F=jnp.nan_to_num(state.F),
                J=jnp.nan_to_num(state.J),
            )

            reward = self.reward_func(state, self.goal)
            if self.aux_reward:
                reward = reward + math.e ** (-contact_distance)

            new_state = self.auto_reset(self.init_state, state, state.key)
            new_state = jax.lax.stop_gradient(new_state)
            state = jax.tree_util.tree_map(
                lambda x, y: jnp.where(_right_broadcast(done, x), y, x), state, new_state
            )

            obs = self.get_obs(state)
            obs_list = jax.vmap(self.get_obs)(state_list)
            info = {"state": state, "state_list": state_list, "obs_list": obs_list}
            return obs, reward, done, info

        return step_diff

    # -------------------------------------------------------------- #
    # scene construction helpers
    # -------------------------------------------------------------- #

    def create_primitive(self, state, friction, color, size, init_pos, softness=666.0,
                         sdf_name="box"):
        p_state = create_primitive(
            self.conf.steps, friction=friction, softness=softness, color=color,
            size=size, init_pos=init_pos,
        )
        self.simulator.register_primitive_sdf(sdf_name)
        state.primitives.append(p_state)
        return state

    def clean_up_b4_reset(self):
        if self.state is not None:
            self.state = self.state._replace(primitives=())
        self.state = None
        self.simulator.sdf_names = []
        self.simulator._colliders = []

    def initialize_after_adding_particle_primitives(self, state):
        self.state = self.simulator.reset(state)
        self.init_state = jax.tree_util.tree_map(lambda t: t, self.state)
        obs_dim = (
            self.simulator.n_particles * 6 + (self.conf.steps + 1) * 3
        )
        self.observation_size = obs_dim

    def render(self, state, visualize=False):
        from unidom_tpu.render.mesh import ParticleRenderer

        if not hasattr(self, "_renderer"):
            self._renderer = ParticleRenderer()
        return self._renderer.render(np.asarray(state.x[0]), visualize)

    def render_volume(self, state, key=None, conf=None, color=None):
        """SDF ray-marched frame of env 0's particles (the reference's Taichi
        volume renderer, plb/engine/renderer/renderer.py:22-530; see
        unidom_tpu/render/volumetric.py). Returns (H, W, 3) uint8."""
        from unidom_tpu.render.volumetric import VolumeConf, VolumeRenderer

        if not hasattr(self, "_vol_renderer") or (
            conf is not None and conf != self._vol_renderer.conf
        ):
            self._vol_renderer = VolumeRenderer(conf or VolumeConf())
        self._vol_renderer.set_particles(state.x[0], color)
        return self._vol_renderer.render_frame(key)

    def step_with_render(self, actions, state: MPMState, visualize=False):
        """step_diff plus one frame per sub-action from state_list
        (mpm_env.py:171-183)."""
        obs, reward, done, info = self.step_diff(actions, state)
        img_list = []
        n_frames = jax.tree_util.tree_leaves(info["state_list"])[0].shape[0]
        for i in range(n_frames):
            s = jax.tree_util.tree_map(lambda t: t[i], info["state_list"])
            rgb, depth = self.render(s, visualize)
            img_list.append(rgb)
        info["img_list"] = img_list
        return obs, reward, done, info
