"""Message transport for the robot bridge: topic-based pub/sub with numpy
payloads.

The reference uses paho-mqtt between the robot host and the policy host
(DaXBench/exp/mqtt_client.py:8-76). Same ``send_msg`` / ``await_msg``
interface here, with two backends:
- ``MQTTTransport`` when paho-mqtt is installed (drop-in for the reference's
  broker setup),
- ``SocketTransport``: a dependency-free length-prefixed-pickle TCP
  transport so the serving path runs (and is tested) anywhere.
"""

import pickle
import queue
import socket
import struct
import threading


def _send_frame(sock, obj):
    data = pickle.dumps(obj)
    sock.sendall(struct.pack(">Q", len(data)) + data)


def _recv_frame(sock):
    hdr = b""
    while len(hdr) < 8:
        chunk = sock.recv(8 - len(hdr))
        if not chunk:
            raise ConnectionError("socket closed")
        hdr += chunk
    (n,) = struct.unpack(">Q", hdr)
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("socket closed")
        buf += chunk
    return pickle.loads(buf)


class SocketTransport:
    """Point-to-point pub/sub over one TCP connection. One side passes
    ``listen=True`` (server), the other connects."""

    def __init__(self, host="127.0.0.1", port=8765, listen=False, subscriptions=()):
        self.subscriptions = set(subscriptions)
        self._queues = {t: queue.Queue() for t in self.subscriptions}
        if listen:
            self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._server.bind((host, port))
            self._server.listen(1)
            self.port = self._server.getsockname()[1]
            self._sock = None
            self._accept_thread = threading.Thread(target=self._accept, daemon=True)
            self._accept_thread.start()
        else:
            self._server = None
            self._sock = socket.create_connection((host, port))
            self.port = port
            self._start_reader()

    def _accept(self):
        self._sock, _ = self._server.accept()
        self._start_reader()

    def _start_reader(self):
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def _read_loop(self):
        try:
            while True:
                msg = _recv_frame(self._sock)
                topic = msg.get("topic")
                self._queues.setdefault(topic, queue.Queue()).put(msg)
        except (ConnectionError, OSError):
            pass

    def send_msg(self, msg):
        if self._sock is None:
            self._accept_thread.join(timeout=10)
        _send_frame(self._sock, msg)

    def await_msg(self, topic, timeout=3600):
        q = self._queues.setdefault(topic, queue.Queue())
        return q.get(timeout=timeout)

    def close(self):
        for s in (self._sock, self._server):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


try:  # pragma: no cover - depends on broker availability
    import paho.mqtt.client as _mqtt

    class MQTTTransport:
        """paho-backed transport (reference mqtt_client.py semantics)."""

        def __init__(self, broker="localhost", port=1883, subscriptions=()):
            self._queues = {t: queue.Queue() for t in subscriptions}
            self._client = _mqtt.Client()
            self._client.on_message = self._on_message
            self._client.connect(broker, port)
            for t in subscriptions:
                self._client.subscribe(t)
            self._client.loop_start()

        def _on_message(self, client, userdata, message):
            msg = pickle.loads(message.payload)
            self._queues.setdefault(message.topic, queue.Queue()).put(
                {"topic": message.topic, "payload": msg}
            )

        def send_msg(self, msg):
            self._client.publish(msg["topic"], pickle.dumps(msg["payload"]))

        def await_msg(self, topic, timeout=3600):
            return self._queues.setdefault(topic, queue.Queue()).get(timeout=timeout)

        def close(self):
            self._client.loop_stop()

    HAVE_MQTT = True
except Exception:
    HAVE_MQTT = False
