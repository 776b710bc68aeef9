"""Gameplay rendering via UDP JSON to RocketSimVis.

Replaces the reference's RenderSender + render_receiver.py
(src/public/RLGymPPO_CPP/Util/RenderSender.cpp:26-96,
python_scripts/render_receiver.py:12-41) without the embedded interpreter:
one env of a batched GameState is serialized to the exact RocketSimVis
UDP schema and sent to 127.0.0.1:9273.
"""

import json
import socket

import numpy as np

UDP_IP = "127.0.0.1"
UDP_PORT = 9273

GAMEMODE_STRS = ["soccar", "hoops", "heatseeker", "snowday", "void"]


def _vec(a):
    return [float(x) for x in np.asarray(a).reshape(-1)[:3]]


class RenderSender:
    def __init__(self, gym, env_index=0, ip=UDP_IP, port=UDP_PORT):
        self.gym = gym
        self.env_index = env_index
        self.addr = (ip, port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def state_to_json(self, gs, actions=None):
        """GameStateToJSON + receiver massaging (RenderSender.cpp:58-96,
        render_receiver.py:19-30) for one env of the batch."""
        i = self.env_index
        rot = np.asarray(gs.car_rot)[i]           # [P, 3, 3] columns f/r/u
        cars = []
        P = rot.shape[0]
        teams = np.asarray(self.gym.match.teams)
        for p in range(P):
            cars.append({
                "car_id": p + 1,
                "team_num": int(teams[p]),
                "phys": {
                    "pos": _vec(np.asarray(gs.car_pos)[i, p]),
                    "forward": _vec(rot[p, :, 0]),
                    "right": _vec(rot[p, :, 1]),
                    "up": _vec(rot[p, :, 2]),
                    "vel": _vec(np.asarray(gs.car_vel)[i, p]),
                    "ang_vel": _vec(np.asarray(gs.car_ang_vel)[i, p]),
                },
                "boost_pickups": int(np.asarray(gs.boost_pickups)[i, p]),
                "is_demoed": bool(np.asarray(gs.is_demoed)[i, p]),
                "on_ground": bool(np.asarray(gs.is_on_ground)[i, p]),
                "ball_touched": bool(np.asarray(gs.ball_touched_step)[i, p]),
                "has_flip": bool(np.asarray(gs.has_flip)[i, p]),
                "boost_amount": float(np.asarray(gs.boost_fraction)[i, p]),
            })
        if actions is not None:
            acts = [[float(v) for v in row]
                    for row in np.asarray(actions)[i].reshape(P, -1)]
        else:
            acts = None
        out = {
            "gamemode": GAMEMODE_STRS[int(self.gym.arena.game_mode)],
            "ball_phys": {
                "pos": _vec(np.asarray(gs.ball_pos)[i]),
                "vel": _vec(np.asarray(gs.ball_vel)[i]),
                "ang_vel": _vec(np.asarray(gs.ball_ang_vel)[i]),
            },
            "cars": cars,
            "boost_pad_states": [bool(b) for b in
                                 np.asarray(gs.pads_active)[i]],
        }
        if acts is not None:
            out["actions"] = acts
        return out

    def send(self, gs, actions=None):
        payload = json.dumps(self.state_to_json(gs, actions)).encode()
        try:
            self.sock.sendto(payload, self.addr)
        except OSError:
            pass
