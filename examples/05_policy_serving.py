"""Robot bridge demo: policy server + robot client over the TCP transport
(swap SocketTransport for MQTTTransport against a real broker)."""

import threading

import numpy as np

from unidom_tpu.serve.policy_server import MockPolicyHandler, robot_client_step, serve
from unidom_tpu.serve.transport import SocketTransport

server_t = SocketTransport(listen=True, port=0, subscriptions=("obs",))
client_t = SocketTransport(port=server_t.port, subscriptions=("action",))

threading.Thread(
    target=serve, args=(server_t, MockPolicyHandler(action_size=6)),
    kwargs={"max_requests": 3}, daemon=True,
).start()

for step in range(3):
    heightmap = np.random.rand(320, 320, 1).astype(np.float32)  # camera obs
    action = robot_client_step(client_t, heightmap, timeout=10)
    print(f"step {step}: action {action}")

server_t.close()
client_t.close()
