"""Car vehicle simulation on the env-last component core.

Semantics-identical port of sim/car.py (itself Car::_PreTickUpdate +
btVehicleRL, RocketSim src/Sim/Car/Car.cpp:58-833 and
src/Sim/btVehicleRL/btVehicleRL.cpp) to the V3/M3 [aux..., P, N] layout —
see maths/v3.py for why. Leading aux axes (4 wheels) broadcast for free
against [P, N] car fields, and boolean masks apply to V3 fields without
any `[..., None]` reshaping.
"""

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths import fastmath
from rlgymppo_cpp_tpu.maths.v3 import V3, M3, vwhere
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import core_rb as rb
from rlgymppo_cpp_tpu.sim.core_state import (
    CoreView, struct_to_core, CAR_SCHEMA,
)
from rlgymppo_cpp_tpu.sim import state as S

SUSPENSION_SUBTRACTION_UU = C.BTVehicle.SUSPENSION_SUBTRACTION * 50.0
ROLLING_FRICTION_SCALE_MAGIC = 113.73963


def core_car_zeros(P, N, boost=C.BOOST_SPAWN_AMOUNT):
    base = struct_to_core(S.CarState.zeros((1, P), boost=boost),
                          CAR_SCHEMA, 1)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, x.shape[:-1] + (N,)), base)


def make_core_wheel_cfg(wheels_cfg):
    """Static per-wheel constants reshaped for leading-axis broadcast."""
    import numpy as np
    conn = np.asarray(wheels_cfg["connection"])      # [4, 3]
    out = dict(wheels_cfg)
    out["conn_v3"] = V3(jnp.asarray(conn[:, 0]).reshape(4, 1, 1),
                        jnp.asarray(conn[:, 1]).reshape(4, 1, 1),
                        jnp.asarray(conn[:, 2]).reshape(4, 1, 1))
    out["radius4"] = jnp.asarray(wheels_cfg["radius"]).reshape(4, 1, 1)
    out["rest4"] = jnp.asarray(wheels_cfg["rest_len"]).reshape(4, 1, 1)
    out["force_scale4"] = jnp.asarray(
        wheels_cfg["force_scale"]).reshape(4, 1, 1)
    out["ii_diag"] = tuple(
        float(v) for v in np.asarray(wheels_cfg["inv_inertia"]))
    return out


def suspension_raycast(cars, cfg, geom, geom_ctx=None):
    """btVehicleRL::rayCast x4 wheels (btVehicleRL.cpp:118-212).

    `geom_ctx`: optional shared per-car grid context (MeshGeom worlds) —
    one gathered row per CAR serves all four wheel rays in registers
    instead of one gather per wheel (gathers are the mesh world's entire
    TPU cost, scripts/mesh_tick_profile.py)."""
    up = cars.rot.u
    radius = cfg["radius4"]
    rest_len = cfg["rest4"]
    travel = C.BTVehicle.MAX_SUSPENSION_TRAVEL

    hard_point = cars.pos + cars.rot.mv(cfg["conn_v3"])      # V3 [4, P, N]
    shape = hard_point.x.shape
    wheel_dir = V3(jnp.broadcast_to(-up.x, shape),
                   jnp.broadcast_to(-up.y, shape),
                   jnp.broadcast_to(-up.z, shape))
    ray_len = jnp.broadcast_to(
        rest_len + travel + radius - SUSPENSION_SUBTRACTION_UU, shape)

    if geom_ctx is not None:
        hit, t, normal = geom.raycast_ctx_core(geom_ctx, hard_point,
                                               wheel_dir, ray_len)
    elif hasattr(geom, "suspension_raycast_core"):
        hit, t, normal = geom.suspension_raycast_core(
            hard_point, wheel_dir, ray_len)
    else:
        hit, t, normal = geom.raycast_core(hard_point, wheel_dir, ray_len,
                                           for_car=True)

    contact_point = hard_point + wheel_dir * t
    trace_len = t
    susp_len = jnp.clip(trace_len - radius, rest_len - travel,
                        rest_len + travel)
    susp_len = jnp.where(hit, susp_len, rest_len + travel)

    denom = normal.dot(up)
    denom_ok = denom > 0.1
    inv = jnp.where(denom_ok, 1.0 / jnp.where(denom_ok, denom, 1.0), 10.0)

    rel_pos = contact_point - cars.pos
    vel_at_contact = rb.velocity_at_point(cars.vel, cars.ang_vel, rel_pos)
    proj_vel = normal.dot(vel_at_contact)
    susp_rel_vel = jnp.where(hit & denom_ok, proj_vel * inv, 0.0)
    clipped_inv = jnp.where(hit, inv, 1.0)

    ii_apply = rb.make_box_ii(cars.rot, cfg["ii_diag"])
    pushback_thresh = rest_len + radius - SUSPENSION_SUBTRACTION_UU
    trace_delta = trace_len - pushback_thresh
    pb_impulse = rb.resolve_single_collision_impulse(
        cars.vel, cars.ang_vel, 1.0 / cfg["mass"], ii_apply,
        rel_pos, normal, trace_delta, cfg["dt"])
    extra_pushback = jnp.where(hit & (trace_len < pushback_thresh),
                               pb_impulse / 4.0, 0.0)

    contact_normal = vwhere(hit, normal, wheel_dir * -1.0)
    return {
        "in_contact": hit,                  # [4, P, N]
        "contact_point": contact_point,     # V3 [4, P, N]
        "contact_normal": contact_normal,
        "susp_len": susp_len,
        "susp_rel_vel": susp_rel_vel,
        "clipped_inv": clipped_inv,
        "extra_pushback": extra_pushback,
        "hard_point": hard_point,
        "ii_apply": ii_apply,
    }


def _steered_axle_and_forward(cars, steer_angle):
    """Steered +right axle and forward per wheel, V3 [4, P, N]
    (updateWheelTransform, btVehicleRL.cpp:64-92); back wheels don't steer."""
    right, fwd = cars.rot.r, cars.rot.f
    zeros = jnp.zeros_like(steer_angle)
    steer4 = jnp.stack([steer_angle, steer_angle, zeros, zeros], axis=0)
    c, s = jnp.cos(steer4), jnp.sin(steer4)
    axle = right * c - fwd * s
    wheel_fwd = fwd * c + right * s
    return axle, wheel_fwd


def calc_friction_impulses(cars, wheels, ray, mass, dt):
    """btVehicleRL::calcFrictionImpulses (btVehicleRL.cpp:313-387)."""
    friction_scale = mass / 3.0
    axle0, _ = _steered_axle_and_forward(cars, wheels.steer_angle)

    n = ray["contact_normal"]
    proj = axle0.dot(n)
    axle = (axle0 - n * proj).normalized()
    forward_dir = n.cross(axle).normalized()

    rel_pos = ray["contact_point"] - cars.pos
    side_impulse = rb.resolve_single_bilateral_impulse(
        cars.vel, cars.ang_vel, 1.0 / mass, ray["ii_apply"], rel_pos, axle)

    vel_at_contact = rb.velocity_at_point(cars.vel, cars.ang_vel, rel_pos)
    rel_vel = vel_at_contact.dot(forward_dir)
    brake = wheels.brake
    braking_friction = jnp.clip(
        -rel_vel * ROLLING_FRICTION_SCALE_MAGIC, -brake, brake)
    engine = wheels.engine_force
    rolling_friction = jnp.where(
        engine != 0, -engine / friction_scale,
        jnp.where(brake > 0, braking_friction, 0.0))

    total_force = (
        forward_dir * (rolling_friction * wheels.long_friction)
        + axle * (side_impulse * wheels.lat_friction)
    ) * friction_scale
    return vwhere(ray["in_contact"], total_force, V3.of(0.0, 0.0, 0.0))


def apply_wheel_impulses(vel, ang_vel, pos, ray, impulse_forces, cfg, dt,
                         up):
    """btVehicleRL::updateVehicleSecond (btVehicleRL.cpp:277-310, 390-402)."""
    rest_len = cfg["rest4"]
    force_scale = cfg["force_scale4"]
    mass = cfg["mass"]
    ii_apply = ray["ii_apply"]

    force = (rest_len - ray["susp_len"]) * C.BTVehicle.SUSPENSION_STIFFNESS \
        * ray["clipped_inv"]
    damping = jnp.where(ray["susp_rel_vel"] < 0,
                        C.BTVehicle.WHEELS_DAMPING_COMPRESSION,
                        C.BTVehicle.WHEELS_DAMPING_RELAXATION)
    susp_force = (force - damping * ray["susp_rel_vel"]) * force_scale
    susp_force = jnp.maximum(susp_force, 0.0)
    susp_force = jnp.where(ray["in_contact"], susp_force, 0.0)

    base = susp_force * dt + ray["extra_pushback"]
    susp_impulse = ray["contact_normal"] * base      # V3 [4, P, N]
    rel_susp = ray["contact_point"] - pos

    vel = vel + susp_impulse.sum(axis=0) * (1.0 / mass)
    ang_vel = ang_vel + ii_apply(rel_susp.cross(susp_impulse).sum(axis=0))

    contact_offset = ray["contact_point"] - pos
    rel_fric = contact_offset - up * up.dot(contact_offset)
    fric_impulse = impulse_forces * dt
    vel = vel + fric_impulse.sum(axis=0) * (1.0 / mass)
    ang_vel = ang_vel + ii_apply(rel_fric.cross(fric_impulse).sum(axis=0))
    return vel, ang_vel


def car_pre_tick(cars, wheels, controls, geom, cfg, mut, dt,
                 respawn_pos_rot, geom_ctx=None):
    """Car::_PreTickUpdate (Car.cpp:58-131) on the core layout.

    Returns (cars', wheels', central_accel V3, active mask [P, N]).
    """
    mass = cfg["mass"]
    controls = clamp_controls(controls)
    jump_pressed = controls.jump & ~cars.last_controls.jump

    demo_timer = jnp.where(
        cars.is_demoed, jnp.maximum(cars.demo_respawn_timer - dt, 0.0), 0.0)
    respawn_now = cars.is_demoed & (demo_timer == 0.0)
    was_demoed = cars.is_demoed
    cars = cars.replace(demo_respawn_timer=demo_timer)
    active = ~was_demoed

    fwd, right, up = cars.rot.f, cars.rot.r, cars.rot.u

    ray = suspension_raycast(cars, cfg, geom, geom_ctx)
    fric_forces = calc_friction_impulses(cars, wheels, ray, mass, dt)

    wheels_with_contact = ray["in_contact"]            # [4, P, N]
    num_contact = jnp.sum(wheels_with_contact.astype(jnp.int32), axis=0)
    is_on_ground = num_contact >= 3
    forward_speed = cars.vel.dot(fwd)
    abs_fwd = jnp.abs(forward_speed)

    central_accel = V3.zeros(forward_speed.shape)
    vel, ang_vel = cars.vel, cars.ang_vel

    # =================== _UpdateWheels (Car.cpp:330-475) ===================
    handbrake_val = jnp.clip(
        jnp.where(controls.handbrake,
                  cars.handbrake_val + C.POWERSLIDE_RISE_RATE * dt,
                  cars.handbrake_val - C.POWERSLIDE_FALL_RATE * dt),
        0.0, 1.0)

    real_throttle = jnp.where(controls.boost & (cars.boost > 0),
                              1.0, controls.throttle)

    drive_speed_scale = C.DRIVE_SPEED_TORQUE_FACTOR_CURVE(abs_fwd)
    engine_throttle = real_throttle
    real_brake = jnp.zeros_like(real_throttle)

    has_throttle = jnp.abs(real_throttle) >= C.THROTTLE_DEADZONE
    opposing = (abs_fwd > C.STOPPING_FORWARD_VEL) & (
        jnp.sign(real_throttle) != jnp.sign(forward_speed))
    real_brake = jnp.where(has_throttle & opposing, 1.0, real_brake)
    engine_throttle = jnp.where(
        has_throttle & opposing
        & (abs_fwd > C.BRAKING_NO_THROTTLE_SPEED_THRESH),
        0.0, engine_throttle)
    coasting_brake = jnp.where(abs_fwd < C.STOPPING_FORWARD_VEL,
                               1.0, C.COASTING_BRAKE_FACTOR)
    real_brake = jnp.where(~has_throttle, coasting_brake, real_brake)
    engine_throttle = jnp.where(~has_throttle, 0.0, engine_throttle)
    real_brake = jnp.where(controls.handbrake, 0.0, real_brake)
    engine_throttle = jnp.where(controls.handbrake, real_throttle,
                                engine_throttle)

    drive_speed_scale = jnp.where(num_contact < 3,
                                  drive_speed_scale / 4.0, drive_speed_scale)

    new_engine_force = engine_throttle * C.THROTTLE_TORQUE_AMOUNT \
        * drive_speed_scale
    new_brake = real_brake * C.BRAKE_TORQUE_AMOUNT

    steer_angle = C.STEER_ANGLE_FROM_SPEED_CURVE(abs_fwd)
    ps_steer = C.POWERSLIDE_STEER_ANGLE_FROM_SPEED_CURVE(abs_fwd)
    steer_angle = steer_angle + (ps_steer - steer_angle) * handbrake_val
    new_steer = steer_angle * controls.steer

    # Friction scalars for next tick (Car.cpp:409-461). The reference's
    # `latDir` there is basis.getColumn(1): the constructor's axis indices
    # are overridden by Car.cpp:238 setCoordinateSystem(1, 2, 0), so
    # column 1 is the steered AXLE (verified at runtime against the
    # compiled engine, tools/golden/probe_friction.cpp).
    lat_dir_w, _ = _steered_axle_and_forward(cars, wheels.steer_angle)
    n = ray["contact_normal"]
    long_dir = lat_dir_w.cross(n)
    wheel_delta = ray["hard_point"] - cars.pos
    cross_vec = rb.velocity_at_point(cars.vel, cars.ang_vel, wheel_delta)
    base_friction = jnp.abs(cross_vec.dot(lat_dir_w))
    fci = jnp.where(
        base_friction > 5.0,
        base_friction / (jnp.abs(cross_vec.dot(long_dir)) + base_friction),
        0.0)
    lat_f = C.LAT_FRICTION_CURVE(fci)
    long_f = C.LONG_FRICTION_CURVE(fci)
    hb = handbrake_val                                  # [P, N] -> bcast [4]
    lat_f_hb = lat_f * ((C.HANDBRAKE_LAT_FRICTION_FACTOR_CURVE(fci) - 1)
                        * hb + 1)
    long_f_hb = long_f * ((C.HANDBRAKE_LONG_FRICTION_FACTOR_CURVE(fci) - 1)
                          * hb + 1)
    has_hb = handbrake_val > 0
    lat_f = jnp.where(has_hb, lat_f_hb, lat_f)
    long_f = jnp.where(has_hb, long_f_hb, jnp.ones_like(long_f))
    sticky = real_throttle != 0
    non_sticky_scale = C.NON_STICKY_FRICTION_FACTOR_CURVE(n.z)
    lat_f = jnp.where(sticky, lat_f, lat_f * non_sticky_scale)
    long_f = jnp.where(sticky, long_f, long_f * non_sticky_scale)
    keep = ~ray["in_contact"]
    lat_f = jnp.where(keep, wheels.lat_friction, lat_f)
    long_f = jnp.where(keep, wheels.long_friction, long_f)

    # Sticky force (Car.cpp:463-474)
    contact_n_sum = vwhere(ray["in_contact"], ray["contact_normal"],
                           V3.of(0.0, 0.0, 0.0)).sum(axis=0)
    any_contact = jnp.any(ray["in_contact"], axis=0)
    upwards_dir = vwhere(contact_n_sum.norm_sq() > 0,
                         contact_n_sum.normalized(), up)
    full_stick = (real_throttle != 0) | (abs_fwd > C.STOPPING_FORWARD_VEL)
    sticky_scale = 0.5 + jnp.where(full_stick,
                                   1 - jnp.abs(upwards_dir.z), 0.0)
    central_accel = central_accel + vwhere(
        any_contact, upwards_dir * (sticky_scale * C.GRAVITY_Z),
        V3.of(0.0, 0.0, 0.0))

    new_wheels = CoreView(
        steer_angle=new_steer, engine_force=new_engine_force,
        brake=new_brake, lat_friction=lat_f, long_friction=long_f)

    # ============ _UpdateAirTorque (Car.cpp:556-641) ========================
    air = num_contact < 3
    is_flipping = jnp.where(air, cars.is_flipping, False)
    is_flipping = jnp.where(
        is_flipping, cars.has_flipped & (cars.flip_time < C.FLIP_TORQUE_TIME),
        is_flipping)

    dir_pitch = -right
    dir_yaw = up
    dir_roll = -fwd

    frt = cars.flip_rel_torque
    flip_torque_nonzero = (frt.x != 0) | (frt.y != 0) | (frt.z != 0)
    cancelling = (frt.y != 0) & (controls.pitch != 0) & (
        jnp.sign(frt.y) == jnp.sign(controls.pitch))
    pitch_scale_flip = jnp.where(
        cancelling, 1 - jnp.minimum(jnp.abs(controls.pitch), 1.0), 1.0)
    dodge_torque_local = V3(frt.x * C.FLIP_TORQUE_X,
                            frt.y * pitch_scale_flip * C.FLIP_TORQUE_Y,
                            jnp.zeros_like(frt.z))
    dodge_dw = cars.rot.mv(dodge_torque_local) * dt
    apply_flip_torque = air & is_flipping & flip_torque_nonzero
    ang_vel = ang_vel + vwhere(apply_flip_torque, dodge_dw,
                               V3.of(0.0, 0.0, 0.0))

    do_air_control = (~is_flipping) | (is_flipping & ~flip_torque_nonzero) \
        | (is_flipping & cancelling)
    do_air_control = do_air_control & ~cars.is_auto_flipping \
        & (num_contact == 0)

    pitch_torque_scale = jnp.where(
        is_flipping, 0.0,
        jnp.where(cars.has_flipped & (
            cars.flip_time < C.FLIP_TORQUE_TIME + C.FLIP_PITCHLOCK_EXTRA_TIME),
            0.0, 1.0))
    has_input = (controls.pitch != 0) | (controls.yaw != 0) \
        | (controls.roll != 0)
    tq = (dir_pitch * (controls.pitch * pitch_torque_scale
                       * C.CAR_AIR_CONTROL_TORQUE[0])
          + dir_yaw * (controls.yaw * C.CAR_AIR_CONTROL_TORQUE[1])
          + dir_roll * (controls.roll * C.CAR_AIR_CONTROL_TORQUE[2]))
    tq = vwhere(has_input, tq, V3.of(0.0, 0.0, 0.0))
    damp_pitch = dir_pitch.dot(ang_vel) * C.CAR_AIR_CONTROL_DAMPING[0] \
        * (1 - jnp.abs(controls.pitch * pitch_torque_scale))
    damp_yaw = dir_yaw.dot(ang_vel) * C.CAR_AIR_CONTROL_DAMPING[1] \
        * (1 - jnp.abs(controls.yaw))
    damp_roll = dir_roll.dot(ang_vel) * C.CAR_AIR_CONTROL_DAMPING[2]
    damping = dir_yaw * damp_yaw + dir_pitch * damp_pitch \
        + dir_roll * damp_roll
    air_dw = (tq - damping) * (C.CAR_TORQUE_SCALE * dt)
    ang_vel = ang_vel + vwhere(air & do_air_control, air_dw,
                               V3.of(0.0, 0.0, 0.0))

    central_accel = central_accel + vwhere(
        air & (controls.throttle != 0),
        fwd * (controls.throttle * C.THROTTLE_AIR_ACCEL),
        V3.of(0.0, 0.0, 0.0))

    is_flipping = jnp.where(air, is_flipping, False)

    # =================== _UpdateJump (Car.cpp:507-554) ======================
    ground_reset_ok = ~(cars.has_jumped & (
        cars.jump_time < C.JUMP_MIN_TIME + C.JUMP_RESET_TIME_PAD))
    reset_jump = is_on_ground & ~cars.is_jumping & ground_reset_ok
    has_jumped = jnp.where(reset_jump, False, cars.has_jumped)
    jump_time = jnp.where(reset_jump, 0.0, cars.jump_time)

    continue_jump = (jump_time < C.JUMP_MIN_TIME) | (
        controls.jump & (jump_time < C.JUMP_MAX_TIME))
    start_jump = ~cars.is_jumping & is_on_ground & jump_pressed
    is_jumping = jnp.where(cars.is_jumping, continue_jump, start_jump)
    jump_time = jnp.where(start_jump, 0.0, jump_time)
    vel = vel + vwhere(start_jump, up * mut.jump_immediate_force,
                       V3.of(0.0, 0.0, 0.0))

    has_jumped = jnp.where(is_jumping, True, has_jumped)
    jump_force_scale = jnp.where(jump_time < C.JUMP_MIN_TIME,
                                 C.JUMP_PRE_MIN_ACCEL_SCALE, 1.0)
    central_accel = central_accel + vwhere(
        is_jumping, up * (mut.jump_accel * jump_force_scale),
        V3.of(0.0, 0.0, 0.0))
    jump_time = jnp.where(is_jumping | has_jumped, jump_time + dt, jump_time)

    # =================== _UpdateAutoFlip (Car.cpp:763-797) ==================
    # roll angle (rotmat_to_euler): roll = atan2(-m[2,1], m[2,2])
    roll_ang = fastmath.atan2(-cars.rot.r.z, cars.rot.u.z)
    autoflip_trigger = (
        jump_pressed & cars.has_world_contact
        & (cars.world_contact_normal.z > C.CAR_AUTOFLIP_NORMZ_THRESH)
        & (jnp.abs(roll_ang) > C.CAR_AUTOFLIP_ROLL_THRESH))
    auto_flip_timer = jnp.where(
        autoflip_trigger, C.CAR_AUTOFLIP_TIME * (jnp.abs(roll_ang) / jnp.pi),
        cars.auto_flip_timer)
    auto_flip_scale = jnp.where(
        autoflip_trigger, jnp.where(roll_ang > 0, 1.0, -1.0),
        cars.auto_flip_torque_scale)
    is_auto_flipping = cars.is_auto_flipping | autoflip_trigger
    vel = vel + vwhere(autoflip_trigger, up * -C.CAR_AUTOFLIP_IMPULSE,
                       V3.of(0.0, 0.0, 0.0))

    af_done = is_auto_flipping & (auto_flip_timer <= 0)
    af_run = is_auto_flipping & (auto_flip_timer > 0)
    ang_vel = ang_vel + vwhere(
        af_run, fwd * (C.CAR_AUTOFLIP_TORQUE * auto_flip_scale * dt),
        V3.of(0.0, 0.0, 0.0))
    auto_flip_timer = jnp.where(af_run, auto_flip_timer - dt,
                                jnp.where(af_done, 0.0, auto_flip_timer))
    is_auto_flipping = jnp.where(af_done, False, is_auto_flipping)

    # ============ _UpdateDoubleJumpOrFlip (Car.cpp:643-761) =================
    on_ground = is_on_ground
    air_time = jnp.where(on_ground, 0.0, cars.air_time + dt)
    air_time_since_jump = jnp.where(
        on_ground, 0.0,
        jnp.where(has_jumped & ~is_jumping,
                  cars.air_time_since_jump + dt, 0.0))
    has_double_jumped = jnp.where(on_ground, False, cars.has_double_jumped)
    has_flipped = jnp.where(on_ground, False, cars.has_flipped)
    flip_time = jnp.where(on_ground, 0.0, cars.flip_time)

    can_try = (~on_ground) & jump_pressed \
        & (air_time_since_jump < C.DOUBLEJUMP_MAX_DELAY)
    input_mag = jnp.abs(controls.yaw) + jnp.abs(controls.pitch) \
        + jnp.abs(controls.roll)
    is_flip_input = input_mag >= cfg["dodge_deadzone"]
    fresh = ~has_double_jumped & ~has_flipped
    can_use = jnp.where(is_flip_input,
                        fresh | mut.unlimited_flips,
                        fresh | mut.unlimited_double_jumps)
    can_use = can_use & ~is_auto_flipping & can_try

    do_flip = can_use & is_flip_input
    do_double_jump = can_use & ~is_flip_input

    dodge_dir = V3(-controls.pitch, controls.yaw + controls.roll,
                   jnp.zeros_like(controls.pitch))
    tiny = (jnp.abs(controls.yaw + controls.roll) < 0.1) \
        & (jnp.abs(controls.pitch) < 0.1)
    dodge_dir = vwhere(tiny, V3.of(0.0, 0.0, 0.0), dodge_dir.normalized())
    new_rel_torque = V3(-dodge_dir.y, dodge_dir.x,
                        jnp.zeros_like(dodge_dir.x))
    dodge_dir = V3(jnp.where(jnp.abs(dodge_dir.x) < 0.1, 0.0, dodge_dir.x),
                   jnp.where(jnp.abs(dodge_dir.y) < 0.1, 0.0, dodge_dir.y),
                   dodge_dir.z)

    non_zero_dodge = (dodge_dir.x != 0) | (dodge_dir.y != 0)
    fwd_ratio = abs_fwd / C.CAR_MAX_SPEED
    backwards = jnp.where(
        abs_fwd < 100.0, dodge_dir.x < 0.0,
        (dodge_dir.x >= 0.0) != (forward_speed >= 0.0))
    init_x = dodge_dir.x * C.FLIP_INITIAL_VEL_SCALE
    init_y = dodge_dir.y * C.FLIP_INITIAL_VEL_SCALE
    max_scale_x = jnp.where(backwards,
                            C.FLIP_BACKWARD_IMPULSE_MAX_SPEED_SCALE,
                            C.FLIP_FORWARD_IMPULSE_MAX_SPEED_SCALE)
    scale_x = ((max_scale_x - 1) * fwd_ratio) + 1.0
    scale_x = scale_x * jnp.where(backwards,
                                  C.FLIP_BACKWARD_IMPULSE_SCALE_X, 1.0)
    scale_y = ((C.FLIP_SIDE_IMPULSE_MAX_SPEED_SCALE - 1) * fwd_ratio) + 1.0
    init_x = init_x * scale_x
    init_y = init_y * scale_y
    fwd_ang = fastmath.atan2(fwd.y, fwd.x)
    ca, sa = jnp.cos(fwd_ang), jnp.sin(fwd_ang)
    delta_v = V3(init_x * ca - init_y * sa, init_x * sa + init_y * ca,
                 jnp.zeros_like(ca))
    vel = vel + vwhere(do_flip & non_zero_dodge, delta_v,
                       V3.of(0.0, 0.0, 0.0))

    flip_rel_torque = vwhere(do_flip, new_rel_torque, cars.flip_rel_torque)
    flip_time = jnp.where(do_flip, 0.0, flip_time)
    has_flipped = has_flipped | do_flip
    is_flipping = is_flipping | do_flip

    vel = vel + vwhere(do_double_jump, up * C.JUMP_IMMEDIATE_FORCE,
                       V3.of(0.0, 0.0, 0.0))
    has_double_jumped = has_double_jumped | do_double_jump

    flip_time = jnp.where(is_flipping | has_flipped, flip_time + dt,
                          flip_time)
    damp_z = is_flipping & (flip_time <= C.FLIP_TORQUE_TIME) \
        & (flip_time >= C.FLIP_Z_DAMP_START) \
        & ((vel.z < 0) | (flip_time < C.FLIP_Z_DAMP_END))
    z_scale = (1 - C.FLIP_Z_DAMP_120) ** (dt * 120.0)
    vel = V3(vel.x, vel.y, jnp.where(damp_z, vel.z * z_scale, vel.z))

    # =================== _UpdateAutoRoll (Car.cpp:799-833) ==================
    do_auto_roll = (controls.throttle != 0) & (
        ((num_contact > 0) & (num_contact < 4)) | cars.has_world_contact)
    ground_up = vwhere(num_contact > 0, upwards_dir,
                       cars.world_contact_normal)
    ground_down = -ground_up
    cross_right = ground_up.cross(fwd)
    cross_fwd = ground_down.cross(cross_right)
    right_factor = 1 - jnp.clip(right.dot(cross_right), 0.0, 1.0)
    fwd_factor = 1 - jnp.clip(fwd.dot(cross_fwd), 0.0, 1.0)
    tq_dir_right = fwd * jnp.where(right.dot(ground_up) >= 0, -1.0, 1.0)
    tq_dir_fwd = right * jnp.where(fwd.dot(ground_up) >= 0, 1.0, -1.0)
    roll_tq = tq_dir_right * right_factor + tq_dir_fwd * fwd_factor
    central_accel = central_accel + vwhere(
        do_auto_roll, ground_down * C.CAR_AUTOROLL_FORCE,
        V3.of(0.0, 0.0, 0.0))
    ang_vel = ang_vel + vwhere(do_auto_roll,
                               roll_tq * (C.CAR_AUTOROLL_TORQUE * dt),
                               V3.of(0.0, 0.0, 0.0))

    has_world_contact = jnp.zeros_like(cars.has_world_contact)

    # ============ updateVehicleSecond: wheel impulses =======================
    vel, ang_vel = apply_wheel_impulses(
        vel, ang_vel, cars.pos, ray, fric_forces, cfg, dt, up)

    # =================== _UpdateBoost (Car.cpp:477-505) =====================
    tsb = cars.time_spent_boosting
    stop_boost = (~controls.boost) & (tsb >= C.BOOST_MIN_TIME)
    tsb = jnp.where(tsb > 0,
                    jnp.where(stop_boost, 0.0, tsb + dt),
                    jnp.where(controls.boost, dt, 0.0))
    boosting = (cars.boost > 0) & (tsb > 0)
    boost = jnp.where(
        boosting,
        jnp.maximum(cars.boost - mut.boost_used_per_second * dt, 0.0),
        cars.boost)
    boost_accel = jnp.where(is_on_ground,
                            mut.boost_accel_ground, mut.boost_accel_air)
    central_accel = central_accel + vwhere(boosting, fwd * boost_accel,
                                           V3.of(0.0, 0.0, 0.0))
    boost = jnp.minimum(boost, C.BOOST_MAX)

    new_cars = cars.replace(
        vel=vel, ang_vel=ang_vel,
        is_on_ground=is_on_ground,
        wheels_with_contact=wheels_with_contact,
        has_jumped=has_jumped, has_double_jumped=has_double_jumped,
        has_flipped=has_flipped, flip_rel_torque=flip_rel_torque,
        jump_time=jump_time, flip_time=flip_time,
        is_flipping=is_flipping, is_jumping=is_jumping,
        air_time=air_time, air_time_since_jump=air_time_since_jump,
        boost=boost, time_spent_boosting=tsb,
        handbrake_val=handbrake_val,
        is_auto_flipping=is_auto_flipping,
        auto_flip_timer=auto_flip_timer,
        auto_flip_torque_scale=auto_flip_scale,
        has_world_contact=has_world_contact,
    )

    # Demoed cars keep their previous state entirely ([P, N] masks
    # broadcast against every [aux..., P, N] leaf from the right)
    new_cars = jax.tree.map(
        lambda new, old: jnp.where(active, new, old), new_cars, cars)
    central_accel = vwhere(active, central_accel, V3.of(0.0, 0.0, 0.0))

    # Respawn overwrites everything (Car::Respawn, Car.cpp:43-56)
    spawn_pos, spawn_rot = respawn_pos_rot
    P, N = active.shape[-2], active.shape[-1]
    respawned = core_car_zeros(P, N, boost=mut.car_spawn_boost_amount)
    respawned = respawned.replace(pos=spawn_pos, rot=spawn_rot)
    new_cars = jax.tree.map(
        lambda fresh, cur: jnp.where(respawn_now, fresh, cur),
        respawned, new_cars)
    new_wheels = jax.tree.map(
        lambda new, old: jnp.where(active & ~respawn_now, new, old),
        new_wheels, CoreView(wheels))

    return new_cars, new_wheels, central_accel, active


def clamp_controls(controls):
    return controls.replace(
        throttle=jnp.clip(controls.throttle, -1, 1),
        steer=jnp.clip(controls.steer, -1, 1),
        pitch=jnp.clip(controls.pitch, -1, 1),
        yaw=jnp.clip(controls.yaw, -1, 1),
        roll=jnp.clip(controls.roll, -1, 1),
    )


def car_post_tick(cars, controls, dt):
    """Car::_PostTickUpdate (Car.cpp:133-163)."""
    speed_sq = cars.vel.norm_sq()
    maintain = cars.is_supersonic \
        & (cars.supersonic_time < C.SUPERSONIC_MAINTAIN_MAX_TIME)
    is_ss = jnp.where(
        maintain,
        speed_sq >= C.SUPERSONIC_MAINTAIN_MIN_SPEED ** 2,
        speed_sq >= C.SUPERSONIC_START_SPEED ** 2)
    ss_time = jnp.where(is_ss, cars.supersonic_time + dt, 0.0)
    cooldown = jnp.where(cars.car_contact_cooldown_timer > 0,
                         jnp.maximum(cars.car_contact_cooldown_timer - dt,
                                     0.0),
                         cars.car_contact_cooldown_timer)
    return cars.replace(
        is_supersonic=is_ss, supersonic_time=ss_time,
        car_contact_cooldown_timer=cooldown,
        last_controls=clamp_controls(controls),
    )


def car_finish_tick(cars, vel_impulse_cache, active):
    """Car::_FinishPhysicsTick (Car.cpp:165-193)."""
    vel = cars.vel + vwhere(active, vel_impulse_cache, V3.of(0.0, 0.0, 0.0))
    vel = vel.clamp_norm(C.CAR_MAX_SPEED)
    ang_vel = cars.ang_vel.clamp_norm(C.CAR_MAX_ANG_SPEED)
    vel = vwhere(active, vel, cars.vel)
    ang_vel = vwhere(active, ang_vel, cars.ang_vel)
    return cars.replace(vel=vel, ang_vel=ang_vel)
