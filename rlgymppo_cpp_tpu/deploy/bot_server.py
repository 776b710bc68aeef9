"""Bot server: actions over a localhost socket, one bot per connection.

The reference deploys via `rlbot::BotManager::StartBotServer(port)`
(RLBotClient.cpp:148-157): the game-side framework connects to a local
server that owns the policy. This is the same role for the TPU build —
newline-delimited JSON over TCP so ANY client (the bundled rlbot agent,
a C++ shim, a test) can drive a trained policy:

  request : {"type": "packet", "index": 0, "packet": {...GameTickPacket
             fields as plain JSON (see json_to_packet)...}}
  response: {"action": [throttle, steer, pitch, yaw, roll, jump, boost,
             handbrake]}

One RLBotBot per (connection, index): tick-skip repeat and the 1-tick
inference offset happen server-side exactly like RLBotClient.cpp:105-146.
"""

import json
import socket
import socketserver
import threading
import types

import numpy as np

from rlgymppo_cpp_tpu.deploy.rlbot_client import RLBotBot, RLBotParams


def json_to_packet(d):
    """Plain-JSON GameTickPacket -> attribute-style object tree."""
    def obj(x):
        if isinstance(x, dict):
            return types.SimpleNamespace(
                **{k: obj(v) for k, v in x.items()})
        if isinstance(x, list):
            return [obj(v) for v in x]
        return x
    return obj(d)


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        bots = {}
        for line in self.rfile:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                self._send({"error": "bad json"})
                continue
            if msg.get("type") == "ping":
                self._send({"pong": True})
                continue
            if msg.get("type") != "packet":
                self._send({"error": f"unknown type {msg.get('type')!r}"})
                continue
            idx = int(msg.get("index", 0))
            if idx not in bots:
                bots[idx] = RLBotBot(f"bot{idx}", 0, idx,
                                     self.server.bot_params)
            action = bots[idx].get_output(json_to_packet(msg["packet"]))
            self._send({"action": [float(a) for a in np.asarray(action)]})

    def _send(self, obj):
        self.wfile.write((json.dumps(obj) + "\n").encode())
        self.wfile.flush()


class BotServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, params: RLBotParams, host="127.0.0.1", port=None):
        port = params.port if port is None else port
        super().__init__((host, port), _Handler)
        self.bot_params = params

    def serve_background(self):
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t


class BotClient:
    """Line-JSON client for BotServer (for tests and external shims)."""

    def __init__(self, host="127.0.0.1", port=23234):
        self.sock = socket.create_connection((host, port))
        self.rfile = self.sock.makefile("rb")

    def request(self, obj):
        self.sock.sendall((json.dumps(obj) + "\n").encode())
        return json.loads(self.rfile.readline())

    def get_action(self, packet_dict, index=0):
        return self.request(
            {"type": "packet", "index": index, "packet": packet_dict})

    def close(self):
        self.sock.close()
