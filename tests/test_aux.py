"""Aux subsystems: serving transport/loop, calibration, checkpointing,
config/variants, CLI, profiling."""

import os
import pickle
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidom_tpu.serve.transport import SocketTransport
from unidom_tpu.serve.policy_server import (
    APGPolicyHandler,
    MockPolicyHandler,
    robot_client_step,
    serve,
)


class TestServing:
    def test_socket_roundtrip_policy_loop(self):
        server_t = SocketTransport(listen=True, port=0, subscriptions=("obs",))
        client_t = SocketTransport(port=server_t.port, subscriptions=("action",))

        t = threading.Thread(
            target=serve, args=(server_t, MockPolicyHandler(6)),
            kwargs={"max_requests": 2}, daemon=True,
        )
        t.start()

        obs = np.random.rand(320, 320, 1).astype(np.float32)
        action = robot_client_step(client_t, obs, timeout=10)
        assert action.shape == (6,)
        action2 = robot_client_step(client_t, obs, timeout=10)
        assert np.allclose(action2, 0)
        t.join(timeout=10)
        server_t.close()
        client_t.close()

    def test_apg_handler(self, tmp_path):
        from unidom_tpu.models.distribution import NormalTanhDistribution
        from unidom_tpu.models.mlp import make_policy_model

        dist = NormalTanhDistribution(6)
        model = make_policy_model(dist.param_size, 20)
        params = model.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "p.pkl")
        with open(path, "wb") as f:
            pickle.dump({"policy_params": jax.device_get(params)}, f)

        h = APGPolicyHandler(path, observation_size=20, action_size=6)
        h.init()
        a = h.infer(np.zeros(20, np.float32))
        assert a.shape == (6,)
        assert np.all((a >= 0) & (a <= 1))


class TestCalibration:
    def test_rope_pose_and_episode(self):
        from unidom_tpu.serve.calibrate import calibrate_episode, rope_pose_from_points
        from unidom_tpu.engine.mpm import MPMConf
        from unidom_tpu.envs.mpm_tasks import ShapeRopeEnv

        # synthetic "real" rope along x at z=0.4
        t = np.linspace(-0.12, 0.12, 60)
        pts = np.stack([0.45 + t, np.full_like(t, 0.01), np.full_like(t, 0.4)], -1)
        center, angle = rope_pose_from_points(pts)
        np.testing.assert_allclose(center, [0.45, 0.4], atol=0.02)
        assert abs(angle) < 0.1 or abs(abs(angle) - np.pi) < 0.1

        conf = MPMConf(n_grid=64, dt=2e-4, steps=5, E=100.0, nu=0.1,
                       ground_friction=0.9, res=(32, 6, 32), task="cal", goal_path="")

        class SmallRope(ShapeRopeEnv):
            PUSH_SUBSTEPS = 3
            DO_RESET_PUSHES = 0

        record = {"state": pts, "action": np.array([0.4, 0, 0.38, 0.5, 0, 0.42]),
                  "next_state": pts + [0.01, 0, 0.01]}
        out = calibrate_episode(SmallRope, record, conf=conf, max_steps=4)
        assert np.isfinite(out["chamfer"])
        assert out["sim_image"].shape == out["real_image"].shape


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from unidom_tpu.utils.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
            save_checkpoint,
        )

        tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": 7}
        save_checkpoint(str(tmp_path), 3, tree)
        save_checkpoint(str(tmp_path), 10, tree)
        latest = latest_checkpoint(str(tmp_path))
        assert "ckpt_10" in latest
        restored = restore_checkpoint(latest, target=tree)
        np.testing.assert_allclose(np.asarray(restored["w"]), tree["w"])


class TestConfig:
    def test_parse_spec(self):
        from unidom_tpu.config import parse_env_spec

        assert parse_env_spec("shape_rope-v3") == ("shape_rope", 3)
        assert parse_env_spec("fold_cloth1") == ("fold_cloth1", 1)

    def test_variant_resolution(self):
        from unidom_tpu.config import resolve_variant

        v1 = resolve_variant("fold_cloth1", 1)
        v3 = resolve_variant("fold_cloth1", 3)
        assert v1.get("stiffness") is None
        assert v3["stiffness"] == 1600

    def test_make_versioned_env(self):
        from unidom_tpu.config import make

        env = make("fold_cloth1-v2", batch_size=1)
        assert float(env.conf.stiffness) == 400


class TestCLI:
    def test_envs_listing(self, capsys):
        from unidom_tpu.cli import main

        assert main(["envs"]) == 0
        out = capsys.readouterr().out
        assert "fold_cloth1" in out and "whip_rope" in out

    def test_unknown(self):
        from unidom_tpu.cli import main

        assert main(["nope"]) == 2


class TestProfiling:
    def test_timer_and_sps(self):
        from unidom_tpu.utils.profiling import Timer, steps_per_second

        with Timer() as t:
            x = jnp.ones((100, 100)) @ jnp.ones((100, 100))
            t.sync(x)
        assert t.elapsed > 0
        assert steps_per_second(3, 4, 2.0) == 6.0


class TestExpertUI:
    def test_projection_maps(self):
        from unidom_tpu.utils.expert_ui import get_projection

        x = np.array([[[0.1, 0.0, 0.1], [0.9, 0.0, 0.9]]])
        m = get_projection(x, size=32)
        assert m.shape == (1, 32, 32)
        assert m.sum() == 2.0

    def test_keymap_shapes(self):
        from unidom_tpu.utils import expert_ui

        for v in expert_ui._KEYMAP.values():
            assert v.shape == (6,)


class TestRobotUtils:
    def test_heightmap(self):
        from unidom_tpu.serve.robot_utils import get_heightmap

        pts = np.array([[0.5, 0.2, 0.5], [0.5, 0.1, 0.5], [np.nan] * 3])
        hm = get_heightmap(pts, grid_size=0.1)
        assert hm.shape == (10, 10)
        assert abs(hm[5, 5] - 0.2) < 1e-6  # highest point wins

    def test_transform_and_nan(self):
        from unidom_tpu.serve.robot_utils import remove_nan, transform_to_base

        tf = np.eye(4); tf[:3, 3] = [1, 2, 3]
        out = transform_to_base(np.zeros((2, 3)), tf)
        np.testing.assert_allclose(out, [[1, 2, 3]] * 2)
        pc = np.array([[0, 0, 0], [np.nan, 0, 0]])
        assert len(remove_nan(pc)) == 1

    def test_segment_and_rescale(self):
        from unidom_tpu.serve.robot_utils import (
            rescale_action_to_workspace,
            segment_by_color,
        )

        img = np.zeros((4, 4, 3)); img[1, 1] = [200, 50, 50]
        m = segment_by_color(img, (150, 0, 0), (255, 100, 100))
        assert m.sum() == 1 and m[1, 1]
        a = rescale_action_to_workspace(np.array([0.5, 0, 0.5, 0.5, 0, 0.5]))
        np.testing.assert_allclose(a[[0, 3]], 0.4)  # midpoint of (0.2, 0.6)
        np.testing.assert_allclose(a[[2, 5]], 0.0)  # midpoint of (-0.3, 0.3)
