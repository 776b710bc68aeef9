"""Differential single-step comparison of wheel/friction internals vs the
compiled reference engine.

Feed each tick's REFERENCE state (from tools/golden/probe_powerslide.cpp)
into ONE tick of the TPU-native engine and compare every intermediate of
the vehicle update (suspension raycast, suspension force, friction scalars,
friction impulse) plus the resulting car state against the reference's next
tick. Because every step restarts from reference state, errors cannot
accumulate — the first diverging quantity IS the modelling difference.

Usage:
    tools/golden/build/probe_powerslide powerslide > /tmp/ref_powerslide.txt
    python tools/golden/friction_diff.py /tmp/ref_powerslide.txt
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from rlgymppo_cpp_tpu.sim import core_car
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.arena import Arena, GameMode
from rlgymppo_cpp_tpu.sim.core_state import arena_state_to_core
from rlgymppo_cpp_tpu.sim.state import CarControls

BT_TO_UU = 50.0


def parse(path):
    ticks, wheels = [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p or p[0].startswith("#"):
                continue
            if p[0] == "tick":
                ticks.append(dict(
                    pos=np.array(p[3:6], np.float64),
                    fwd=np.array(p[7:10], np.float64),
                    right=np.array(p[11:14], np.float64),
                    up=np.array(p[15:18], np.float64),
                    vel=np.array(p[19:22], np.float64),
                    ang=np.array(p[23:26], np.float64),
                    hb=float(p[27])))
                wheels.append([])
            else:
                w = dict(
                    contact=int(p[3]), susp_len=float(p[5]),
                    susp_rel_vel=float(p[7]), clipped_inv=float(p[9]),
                    susp_force=float(p[11]), extra_pb=float(p[13]),
                    steer=float(p[15]), engine=float(p[17]),
                    brake=float(p[19]), lat_f=float(p[21]),
                    long_f=float(p[23]),
                    impulse=np.array(p[25:28], np.float64),
                    cn=np.array(p[29:32], np.float64),
                    cp=np.array(p[33:36], np.float64))
                wheels[-1].append(w)
    return ticks, wheels


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_powerslide.txt"
    scenario = sys.argv[2] if len(sys.argv) > 2 else "powerslide"
    ticks, wheels = parse(path)
    T = len(ticks)

    arena = Arena(GameMode.SOCCAR, teams=(0,))
    st0 = arena.default_state(batch_shape=(1,))
    dt = arena.tick_time
    cfg = arena.core_wheel_cfg
    mass = cfg["mass"]

    if scenario == "powerslide":
        ctl = CarControls(
            throttle=jnp.ones((1, 1)), steer=jnp.ones((1, 1)),
            pitch=jnp.zeros((1, 1)), yaw=jnp.zeros((1, 1)),
            roll=jnp.zeros((1, 1)), jump=jnp.zeros((1, 1), bool),
            boost=jnp.zeros((1, 1), bool),
            handbrake=jnp.ones((1, 1), bool))
    else:
        ctl = CarControls(
            throttle=jnp.ones((1, 1)), steer=jnp.ones((1, 1)),
            pitch=jnp.zeros((1, 1)), yaw=jnp.zeros((1, 1)),
            roll=jnp.zeros((1, 1)), jump=jnp.zeros((1, 1), bool),
            boost=jnp.zeros((1, 1), bool),
            handbrake=jnp.zeros((1, 1), bool))

    def seed_state(t):
        tk, ws = ticks[t], wheels[t]
        rot = np.stack([tk["fwd"], tk["right"], tk["up"]],
                       axis=-1)[None, None]          # [1, 1, 3, 3]
        cars = st0.cars.replace(
            pos=jnp.asarray(tk["pos"][None, None], jnp.float32),
            rot=jnp.asarray(rot, jnp.float32),
            vel=jnp.asarray(tk["vel"][None, None], jnp.float32),
            ang_vel=jnp.asarray(tk["ang"][None, None], jnp.float32),
            is_on_ground=jnp.asarray([[sum(w["contact"] for w in ws) >= 3]]),
            handbrake_val=jnp.asarray([[tk["hb"]]], jnp.float32),
            boost=jnp.asarray([[100.0 / 3]], jnp.float32),
            last_controls=jax.tree.map(lambda x: x[:, :], ctl),
        )
        whl = st0.wheels.replace(
            steer_angle=jnp.asarray([[ws[0]["steer"]]], jnp.float32),
            engine_force=jnp.asarray([[ws[0]["engine"] * BT_TO_UU]],
                                     jnp.float32),
            brake=jnp.asarray([[ws[0]["brake"] * BT_TO_UU]], jnp.float32),
            lat_friction=jnp.asarray(
                [[[w["lat_f"] for w in ws]]], jnp.float32),
            long_friction=jnp.asarray(
                [[[w["long_f"] for w in ws]]], jnp.float32),
        )
        ball = st0.ball.replace(
            pos=jnp.asarray([[3500.0, -3500.0, 93.15]]),
            vel=jnp.zeros((1, 3)), ang_vel=jnp.zeros((1, 3)))
        return st0.replace(cars=cars, wheels=whl, ball=ball)

    @jax.jit
    def probe_step(state):
        core = arena_state_to_core(state)
        cars, whl = core.cars, core.wheels
        ray = core_car.suspension_raycast(cars, cfg, arena.geom)
        fric = core_car.calc_friction_impulses(cars, whl, ray, mass, dt)
        # replicate updateSuspension force computation
        force = (cfg["rest4"] - ray["susp_len"]) \
            * C.BTVehicle.SUSPENSION_STIFFNESS * ray["clipped_inv"]
        damping = jnp.where(ray["susp_rel_vel"] < 0,
                            C.BTVehicle.WHEELS_DAMPING_COMPRESSION,
                            C.BTVehicle.WHEELS_DAMPING_RELAXATION)
        susp_force = (force - damping * ray["susp_rel_vel"]) \
            * cfg["force_scale4"]
        susp_force = jnp.maximum(susp_force, 0.0)
        susp_force = jnp.where(ray["in_contact"], susp_force, 0.0)
        nxt, _ = arena.tick(state, ctl, jax.random.PRNGKey(0))
        out = {
            "contact": ray["in_contact"][:, 0, 0],
            "susp_len": ray["susp_len"][:, 0, 0],
            "susp_rel_vel": ray["susp_rel_vel"][:, 0, 0],
            "clipped_inv": ray["clipped_inv"][:, 0, 0],
            "extra_pb": ray["extra_pushback"][:, 0, 0],
            "susp_force": susp_force[:, 0, 0],
            "impulse": jnp.stack([fric.x[:, 0, 0], fric.y[:, 0, 0],
                                  fric.z[:, 0, 0]], axis=-1),
            "cn": jnp.stack([ray["contact_normal"].x[:, 0, 0],
                             ray["contact_normal"].y[:, 0, 0],
                             ray["contact_normal"].z[:, 0, 0]], axis=-1),
            "pos": nxt.cars.pos[0, 0], "vel": nxt.cars.vel[0, 0],
            "ang": nxt.cars.ang_vel[0, 0],
            "rot": nxt.cars.rot[0, 0],
            "hb": nxt.cars.handbrake_val[0, 0],
            "steer_next": nxt.wheels.steer_angle[0, 0],
            "engine_next": nxt.wheels.engine_force[0, 0],
            "brake_next": nxt.wheels.brake[0, 0],
            "lat_next": nxt.wheels.lat_friction[0, 0],
            "long_next": nxt.wheels.long_friction[0, 0],
        }
        return out

    # accumulate worst errors per quantity
    worst = {}

    def note(name, t, err, ours, ref):
        if name not in worst or err > worst[name][1]:
            worst[name] = (t, err, ours, ref)

    for t in range(1, T - 1):
        o = jax.device_get(probe_step(seed_state(t)))
        rw = wheels[t + 1]
        rt = ticks[t + 1]
        # internals computed during reference tick t+1 (from state t)
        note("susp_len", t,
             np.abs(o["susp_len"] - np.array(
                 [w["susp_len"] for w in rw]) * BT_TO_UU).max(),
             o["susp_len"], [w["susp_len"] * BT_TO_UU for w in rw])
        note("susp_rel_vel", t,
             np.abs(o["susp_rel_vel"] - np.array(
                 [w["susp_rel_vel"] for w in rw]) * BT_TO_UU).max(),
             o["susp_rel_vel"], [w["susp_rel_vel"] * BT_TO_UU for w in rw])
        note("susp_force", t,
             np.abs(o["susp_force"] - np.array(
                 [w["susp_force"] for w in rw]) * BT_TO_UU).max(),
             o["susp_force"], [w["susp_force"] * BT_TO_UU for w in rw])
        note("extra_pb", t,
             np.abs(o["extra_pb"] - np.array(
                 [w["extra_pb"] for w in rw]) * BT_TO_UU).max(),
             o["extra_pb"], [w["extra_pb"] * BT_TO_UU for w in rw])
        rimp = np.stack([w["impulse"] for w in rw]) * BT_TO_UU
        # reference m_impulse is a force (applied x dt); ours likewise
        note("fric_impulse", t,
             np.abs(o["impulse"] - rimp).max(), o["impulse"], rimp)
        note("contact", t,
             np.abs(o["contact"].astype(int)
                    - np.array([w["contact"] for w in rw])).max(),
             o["contact"], [w["contact"] for w in rw])
        # next-tick wheel scalars (computed in tick t+1's _UpdateWheels)
        note("steer", t, abs(o["steer_next"] - rw[0]["steer"]),
             o["steer_next"], rw[0]["steer"])
        note("engine", t,
             abs(o["engine_next"] - rw[0]["engine"] * BT_TO_UU),
             o["engine_next"], rw[0]["engine"] * BT_TO_UU)
        note("brake", t, abs(o["brake_next"] - rw[0]["brake"] * BT_TO_UU),
             o["brake_next"], rw[0]["brake"] * BT_TO_UU)
        note("lat_f", t,
             np.abs(o["lat_next"] - np.array(
                 [w["lat_f"] for w in rw])).max(),
             o["lat_next"], [w["lat_f"] for w in rw])
        note("long_f", t,
             np.abs(o["long_next"] - np.array(
                 [w["long_f"] for w in rw])).max(),
             o["long_next"], [w["long_f"] for w in rw])
        # resulting state
        note("pos", t, np.abs(o["pos"] - rt["pos"]).max(),
             o["pos"], rt["pos"])
        note("vel", t, np.abs(o["vel"] - rt["vel"]).max(),
             o["vel"], rt["vel"])
        note("ang_vel", t, np.abs(o["ang"] - rt["ang"]).max(),
             o["ang"], rt["ang"])
        note("hb", t, abs(o["hb"] - rt["hb"]), o["hb"], rt["hb"])

    print(f"single-step worst errors over {T - 2} ticks "
          f"({scenario}; all UU units):")
    for name, (t, err, ours, ref) in sorted(worst.items()):
        print(f"  {name:14s} max {err:12.6g} @t{t}")
        print(f"      ours {np.round(np.asarray(ours, np.float64), 6)}")
        print(f"      ref  {np.round(np.asarray(ref, np.float64), 6)}")


if __name__ == "__main__":
    main()
