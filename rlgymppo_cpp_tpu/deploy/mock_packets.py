"""Synthetic GameTickPacket streams for exercising the deployment path
without the rlbot framework or a running game.

Objects mimic the attribute layout RLBotBot/packet_to_game_state consume
(RLBotClient.cpp:75-103's input shape): game_cars[i].physics.location...,
game_ball.physics, game_info.seconds_elapsed, game_boosts[].is_active.
"""

import math
import types

BOOST_LOCATIONS_AMOUNT = 34


def _v(x, y, z):
    return types.SimpleNamespace(x=float(x), y=float(y), z=float(z))


def _phys(pos, vel=(0, 0, 0), rot=(0, 0, 0), ang=(0, 0, 0)):
    return types.SimpleNamespace(
        location=_v(*pos), velocity=_v(*vel),
        rotation=types.SimpleNamespace(
            yaw=float(rot[0]), pitch=float(rot[1]), roll=float(rot[2])),
        angular_velocity=_v(*ang))


def make_packet(t, num_cars=2):
    """One synthetic frame at game time t (seconds, 120 tps)."""
    cars = []
    for i in range(num_cars):
        side = 1.0 if i % 2 == 0 else -1.0
        cars.append(types.SimpleNamespace(
            physics=_phys(
                pos=(500.0 * math.sin(t + i), side * -1000.0, 17.0),
                vel=(300.0 * math.cos(t + i), 0.0, 0.0),
                rot=(0.4 * t * side, 0.0, 0.0)),
            boost=48.0,
            has_wheel_contact=True,
            is_demolished=False,
            jumped=False,
            double_jumped=False,
            team=i % 2,
        ))
    ball = types.SimpleNamespace(physics=_phys(
        pos=(800.0 * math.cos(t * 0.5), 400.0 * math.sin(t * 0.5), 93.15),
        vel=(-200.0 * math.sin(t * 0.5), 150.0 * math.cos(t * 0.5), 0.0)))
    boosts = [types.SimpleNamespace(is_active=True)
              for _ in range(BOOST_LOCATIONS_AMOUNT)]
    return types.SimpleNamespace(
        num_cars=num_cars,
        game_cars=cars,
        game_ball=ball,
        num_boost=BOOST_LOCATIONS_AMOUNT,
        game_boosts=boosts,
        game_info=types.SimpleNamespace(seconds_elapsed=float(t)),
    )


def make_packet_stream(n, num_cars=2, dt=1.0 / 120.0):
    for k in range(n):
        yield make_packet(k * dt, num_cars=num_cars)


def packet_to_json(packet):
    """SimpleNamespace packet tree -> plain-JSON dict (BotServer wire
    format; inverse of bot_server.json_to_packet)."""
    def enc(x):
        if isinstance(x, types.SimpleNamespace):
            return {k: enc(v) for k, v in vars(x).items()}
        if isinstance(x, list):
            return [enc(v) for v in x]
        return x
    return enc(packet)
