"""Sim-vs-real calibration harness.

Reference: DaXBench/exp/calibrate.py:65-166 — load recorded rope episodes
(state point cloud, action, next-state point cloud), re-initialize the sim
rope to the observed pose (center + angle from the two endpoints,
calibrate.py get_two_ends:52-63), replay the recorded action, and compare
top-down projections / chamfer of the resulting clouds.
"""

import glob
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from unidom_tpu.ops.metrics import chamfer
from unidom_tpu.render.software import render_points_topdown


def get_two_ends(points):
    """Endpoints = the pair of points with maximal separation in the ground
    plane (robust version of calibrate.py:52-63)."""
    pts = np.asarray(points)[:, [0, 2]]
    # farthest point from the centroid, then farthest from that
    c = pts.mean(0)
    a = pts[np.argmax(((pts - c) ** 2).sum(-1))]
    b = pts[np.argmax(((pts - a) ** 2).sum(-1))]
    return a, b


def rope_pose_from_points(points):
    """(center_xz, angle) of the observed rope."""
    a, b = get_two_ends(points)
    center = (a + b) / 2.0
    d = b - a
    angle = float(np.arctan2(d[1], d[0]))
    return center, angle


def make_env_at_pose(env_cls, center_xz, angle, batch_size=1, seed=0, **env_kwargs):
    """Build a ShapeRope-style env whose rope starts at the observed pose."""
    env = env_cls(batch_size=batch_size, seed=seed, **env_kwargs)
    env.DO_RESET_PUSHES = 0

    init_pos = [float(center_xz[0]), env.ROPE_INIT_POS[1], float(center_xz[1])]
    env.clean_up_b4_reset()
    state = env.simulator.add_box(
        state=None, hardness=1.0, size=env.ROPE_WIDTH, init_pos=init_pos,
        z_rotation_angle=-angle, material=env.ROPE_MATERIAL,
        density=env.ROPE_DENSITY,
    )
    state = env.create_primitive(
        state, friction=0.1, color=[0.5, 0.5, 0.5],
        size=env.PRIM_SIZE, init_pos=env.PRIM_INIT, sdf_name="box",
    )
    env.initialize_after_adding_particle_primitives(state)
    return env, env.state


def calibrate_episode(env_cls, record, size=512, **env_kwargs):
    """Replay one recorded (state, action, next_state) transition in sim.

    record: dict with 'state' (N, 3), 'action' (6,), 'next_state' (M, 3).
    Returns dict with chamfer distance and side-by-side projection images.
    """
    center, angle = rope_pose_from_points(record["state"])
    env, state = make_env_at_pose(env_cls, center, angle, **env_kwargs)

    action = jnp.asarray(record["action"], jnp.float32).reshape(1, -1)
    _, _, _, info = env.step_diff(action, state)
    sim_next = np.asarray(info["state"].x[0])

    real_next = np.asarray(record["next_state"])
    d = float(chamfer(jnp.asarray(sim_next)[None], jnp.asarray(real_next))[0])

    return {
        "chamfer": d,
        "sim_image": render_points_topdown(sim_next, size),
        "real_image": render_points_topdown(real_next, size),
        "init_center": center,
        "init_angle": angle,
    }


def replay_episode(before, after, pick, place, settle=True, **env_kwargs):
    """Replay one recorded real-robot pick-and-place push in simulation.

    Mirrors the reference's compare_file (exp/calibrate.py:96-152): the real
    clouds are z-up robot frame -> swap axes 1 and 2; the push action is
    [pick_x, 0, pick_y, place_x, 0, place_y]; an optional null push first
    lets the rope settle as the reference does (calibrate.py:124-127).
    Returns chamfer(sim, real_after) before and after the replayed push.
    """
    from unidom_tpu.envs.mpm_tasks import ShapeRopeEnv

    before = np.asarray(before, np.float32)[:, [0, 2, 1]]
    after = np.asarray(after, np.float32)[:, [0, 2, 1]]

    center, angle = rope_pose_from_points(before)
    env, state = make_env_at_pose(ShapeRopeEnv, center, angle, **env_kwargs)
    if settle:
        null_action = jnp.array([[0.08, 0.001, 0.88, 0.12, 0.001, 0.92]])
        _, _, _, info = env.step_diff(null_action, state)
        state = info["state"]

    real_next = jnp.asarray(after)
    d_before = float(chamfer(state.x[:1], real_next)[0])

    action = jnp.array(
        [[pick[0], 0.0, pick[1], place[0], 0.0, place[1]]], jnp.float32
    )
    _, _, _, info = env.step_diff(action, state)
    sim_next = info["state"].x[0]
    d_after = float(chamfer(sim_next[None], real_next)[0])

    return {
        "chamfer_before": d_before,
        "chamfer_after": d_after,
        "sim_next": np.asarray(sim_next),
        "init_center": center,
        "init_angle": angle,
    }


def calibrate_directory(env_cls, data_dir, pattern="*.pkl", **env_kwargs):
    """Run calibration over every recorded episode (calibrate.py main loop)."""
    results = []
    for path in sorted(glob.glob(f"{data_dir}/{pattern}")):
        with open(path, "rb") as f:
            record = pickle.load(f)
        r = calibrate_episode(env_cls, record, **env_kwargs)
        r["path"] = path
        results.append(r)
        print(f"{path}: chamfer {r['chamfer']:.4f}")
    return results
