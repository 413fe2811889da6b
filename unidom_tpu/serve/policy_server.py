"""Policy serving loop for hardware-in-the-loop execution.

Reference: DaXBench/exp/policy_server.py:70-90 (policy host event loop:
await obs -> infer -> publish action) and exp/experiment.py:63-90 (robot
host loop). The message shapes are preserved: obs payloads are numpy
heightmaps or point clouds; action payloads are (action_size,) arrays.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np


class MockPolicyHandler:
    """Zero-action handler (policy_server.py mock)."""

    def __init__(self, action_size=6):
        self.action_size = action_size

    def init(self):
        pass

    def infer(self, obs):
        return np.zeros((self.action_size,), np.float32)


class APGPolicyHandler:
    """Serve a trained APG policy checkpoint."""

    def __init__(self, checkpoint_path, observation_size, action_size):
        self.checkpoint_path = checkpoint_path
        self.observation_size = observation_size
        self.action_size = action_size

    def init(self):
        from unidom_tpu.models.distribution import NormalTanhDistribution
        from unidom_tpu.models.mlp import make_policy_model

        with open(self.checkpoint_path, "rb") as f:
            ckpt = pickle.load(f)
        self.params = ckpt["policy_params"] if isinstance(ckpt, dict) else ckpt
        self.dist = NormalTanhDistribution(self.action_size)
        self.model = make_policy_model(self.dist.param_size, self.observation_size)
        self._apply = jax.jit(
            lambda p, o: jax.nn.sigmoid(self.dist.mode(self.model.apply(p, o)))
        )

    def infer(self, obs):
        obs = jnp.asarray(obs, jnp.float32).reshape(1, -1)
        return np.asarray(self._apply(self.params, obs))[0]


def serve(transport, handler, obs_topic="obs", action_topic="action",
          max_requests=None):
    """The event loop of policy_server.py:79-90. ``max_requests`` bounds the
    loop for tests; None = forever."""
    handler.init()
    served = 0
    while max_requests is None or served < max_requests:
        msg = transport.await_msg(obs_topic, timeout=3600)
        action = handler.infer(msg["payload"])
        transport.send_msg({"topic": action_topic, "payload": action})
        served += 1
    return served


def robot_client_step(transport, obs, obs_topic="obs", action_topic="action",
                      timeout=60):
    """One robot-side exchange (experiment.py:63-90): publish obs, await
    action."""
    transport.send_msg({"topic": obs_topic, "payload": obs})
    return transport.await_msg(action_topic, timeout=timeout)["payload"]
