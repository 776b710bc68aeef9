"""Vectorized car vehicle simulation.

Re-expresses the reference's per-car object code — Car::_PreTickUpdate and
friends (RocketSim src/Sim/Car/Car.cpp:58-833) plus btVehicleRL
(src/Sim/btVehicleRL/btVehicleRL.cpp) — as masked array math over a batch of
cars with shape [..., P]. Every `if` on car state becomes a `jnp.where`; the
~30 booleans/timers of CarState update in the exact same order as the
reference so the state machine semantics match.

Wheel control values (engine force, brake, steer, friction scalars) are
computed in `_UpdateWheels` each tick but *consumed* by the friction-impulse
calculation at the start of the next tick, exactly like the reference
(updateVehicleFirst runs before _UpdateWheels; btVehicleRL.cpp:218-235,
Car.cpp:89-109). They are therefore part of `WheelsState`.

Units are UU throughout (1 bt = 50 uu); bt-unit constants from the reference
are converted where they appear.
"""

import jax
import jax.numpy as jnp
from flax import struct

from rlgymppo_cpp_tpu.maths.vec import dot, cross, norm, normalized
from rlgymppo_cpp_tpu.maths.rot import rotmat_to_euler
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import rigidbody as rb
from rlgymppo_cpp_tpu.sim.state import CarState, WheelsState

# bt-unit constants used raw by the reference, converted to uu
SUSPENSION_SUBTRACTION_UU = C.BTVehicle.SUSPENSION_SUBTRACTION * 50.0
ROLLING_FRICTION_SCALE_MAGIC = 113.73963  # btVehicleRL.cpp:369 (scale-free)


def _where(mask, a, b):
    return jnp.where(mask, a, b)


def _wherev(mask, a, b):
    return jnp.where(mask[..., None], a, b)


def suspension_raycast(cars: CarState, wheels_cfg, geom):
    """All 4 suspension raycasts per car (btVehicleRL::rayCast,
    btVehicleRL.cpp:118-212), vectorized to [..., 4].

    Returns dict with per-wheel contact data used by both the suspension and
    friction phases.
    """
    up = cars.up                                    # [..., 3]
    rot = cars.rot
    conn = jnp.asarray(wheels_cfg["connection"])    # [4, 3]
    radius = jnp.asarray(wheels_cfg["radius"])      # [4]
    rest_len = jnp.asarray(wheels_cfg["rest_len"])  # [4]
    travel = C.BTVehicle.MAX_SUSPENSION_TRAVEL

    hard_point = cars.pos[..., None, :] + jnp.einsum(
        "...ij,wj->...wi", rot, conn)               # [..., 4, 3]
    wheel_dir = -up[..., None, :]                   # [..., 4, 3] (broadcast)
    ray_len = rest_len + travel + radius - SUSPENSION_SUBTRACTION_UU  # [4]
    ray_len_b = jnp.broadcast_to(ray_len, hard_point.shape[:-1])

    hit, t, normal = geom.raycast(
        hard_point, jnp.broadcast_to(wheel_dir, hard_point.shape), ray_len_b)

    contact_point = hard_point + wheel_dir * t[..., None]
    # trace length along car up (= t, since the ray runs along -up)
    trace_len = t
    susp_len = jnp.clip(trace_len - radius, rest_len - travel, rest_len + travel)
    susp_len = _where(hit, susp_len, rest_len + travel)

    denom = dot(normal, up[..., None, :])
    denom_ok = denom > 0.1
    inv = jnp.where(denom_ok, 1.0 / jnp.where(denom_ok, denom, 1.0), 10.0)

    rel_pos = contact_point - cars.pos[..., None, :]
    vel_at_contact = rb.velocity_at_point(
        cars.vel[..., None, :], cars.ang_vel[..., None, :], rel_pos)
    proj_vel = dot(normal, vel_at_contact)
    susp_rel_vel = jnp.where(hit & denom_ok, proj_vel * inv, 0.0)
    clipped_inv = jnp.where(hit, inv, 1.0)

    # Extra pushback when the ray hits inside the chassis-adjacent threshold
    # (btVehicleRL.cpp:184-201)
    inv_inertia_w = rb.inv_inertia_world(rot, jnp.asarray(wheels_cfg["inv_inertia"]))
    pushback_thresh = rest_len + radius - SUSPENSION_SUBTRACTION_UU
    trace_delta = trace_len - pushback_thresh
    pb_impulse = rb.resolve_single_collision_impulse(
        cars.vel[..., None, :], cars.ang_vel[..., None, :],
        1.0 / wheels_cfg["mass"], inv_inertia_w[..., None, :, :],
        rel_pos, normal, trace_delta, wheels_cfg["dt"])
    extra_pushback = jnp.where(hit & (trace_len < pushback_thresh),
                               pb_impulse / 4.0, 0.0)

    contact_normal = _wherev(hit, normal, jnp.broadcast_to(up[..., None, :], normal.shape))
    return {
        "in_contact": hit,                 # [..., 4]
        "contact_point": contact_point,    # [..., 4, 3]
        "contact_normal": contact_normal,  # [..., 4, 3]
        "susp_len": susp_len,
        "susp_rel_vel": susp_rel_vel,
        "clipped_inv": clipped_inv,
        "extra_pushback": extra_pushback,
        "hard_point": hard_point,
        "inv_inertia_w": inv_inertia_w,
    }


def _steered_axle_and_forward(cars, steer_angle):
    """Steered wheel axle (+right) and forward dirs per wheel [..., 4, 3]
    (updateWheelTransform, btVehicleRL.cpp:64-92). Back wheels never steer."""
    right, fwd, up = cars.right, cars.forward, cars.up
    zeros = jnp.zeros_like(steer_angle)
    steer4 = jnp.stack([steer_angle, steer_angle, zeros, zeros], axis=-1)  # [..., 4]
    c, s = jnp.cos(steer4)[..., None], jnp.sin(steer4)[..., None]
    # rotate about up: right' = right*cos + (up x right)*sin ; up x right = -forward
    axle = right[..., None, :] * c - fwd[..., None, :] * s
    wheel_fwd = fwd[..., None, :] * c + right[..., None, :] * s
    return axle, wheel_fwd


def calc_friction_impulses(cars: CarState, wheels: WheelsState, ray, mass, dt):
    """btVehicleRL::calcFrictionImpulses (btVehicleRL.cpp:313-387).

    Uses this tick's raycast contacts but LAST tick's engine/brake/steer and
    friction scalars, like the reference. Returns per-wheel impulse forces
    [..., 4, 3] (to be applied scaled by dt).
    """
    friction_scale = mass / 3.0
    axle0, _ = _steered_axle_and_forward(cars, wheels.steer_angle)

    n = ray["contact_normal"]
    proj = dot(axle0, n)
    axle = normalized(axle0 - n * proj[..., None])
    forward_dir = normalized(cross(n, axle))  # ~= -car forward on flat ground

    rel_pos = ray["contact_point"] - cars.pos[..., None, :]
    inv_inertia_w = ray["inv_inertia_w"][..., None, :, :]
    side_impulse = rb.resolve_single_bilateral_impulse(
        cars.vel[..., None, :], cars.ang_vel[..., None, :],
        1.0 / mass, inv_inertia_w, rel_pos, axle)

    # Rolling friction: engine force, else braking friction, else zero
    vel_at_contact = rb.velocity_at_point(
        cars.vel[..., None, :], cars.ang_vel[..., None, :], rel_pos)
    rel_vel = dot(vel_at_contact, forward_dir)
    brake = wheels.brake[..., None]
    braking_friction = jnp.clip(
        -rel_vel * ROLLING_FRICTION_SCALE_MAGIC, -brake, brake)
    engine = wheels.engine_force[..., None]
    has_engine = engine != 0
    rolling_friction = jnp.where(
        has_engine, -engine / friction_scale,
        jnp.where(brake > 0, braking_friction, 0.0))

    total_force = (
        forward_dir * (rolling_friction * wheels.long_friction)[..., None]
        + axle * (side_impulse * wheels.lat_friction)[..., None]
    ) * friction_scale
    return jnp.where(ray["in_contact"][..., None], total_force, 0.0)


def apply_wheel_impulses(cars: CarState, ray, impulse_forces, wheels_cfg, dt):
    """btVehicleRL::updateVehicleSecond: suspension impulses
    (btVehicleRL.cpp:277-310) then friction impulses (:390-402)."""
    rest_len = jnp.asarray(wheels_cfg["rest_len"])
    force_scale = jnp.asarray(wheels_cfg["force_scale"])
    mass = wheels_cfg["mass"]
    inv_inertia_w = ray["inv_inertia_w"]

    force = (rest_len - ray["susp_len"]) * C.BTVehicle.SUSPENSION_STIFFNESS \
        * ray["clipped_inv"]
    damping = jnp.where(ray["susp_rel_vel"] < 0,
                        C.BTVehicle.WHEELS_DAMPING_COMPRESSION,
                        C.BTVehicle.WHEELS_DAMPING_RELAXATION)
    susp_force = (force - damping * ray["susp_rel_vel"]) * force_scale
    susp_force = jnp.maximum(susp_force, 0.0)
    susp_force = jnp.where(ray["in_contact"], susp_force, 0.0)

    base = susp_force * dt + ray["extra_pushback"]
    susp_impulse = ray["contact_normal"] * base[..., None]  # [..., 4, 3]
    rel_susp = ray["contact_point"] - cars.pos[..., None, :]

    vel, ang_vel = cars.vel, cars.ang_vel
    # Suspension: full torque arm
    vel = vel + jnp.sum(susp_impulse, axis=-2) / mass
    ang_vel = ang_vel + jnp.einsum(
        "...ij,...j->...i", inv_inertia_w,
        jnp.sum(cross(rel_susp, susp_impulse), axis=-2))

    # Friction: torque arm projected off the up axis (btVehicleRL.cpp:396-399)
    up = cars.up[..., None, :]
    contact_offset = ray["contact_point"] - cars.pos[..., None, :]
    rel_fric = contact_offset - up * dot(up, contact_offset)[..., None]
    fric_impulse = impulse_forces * dt
    vel = vel + jnp.sum(fric_impulse, axis=-2) / mass
    ang_vel = ang_vel + jnp.einsum(
        "...ij,...j->...i", inv_inertia_w,
        jnp.sum(cross(rel_fric, fric_impulse), axis=-2))
    return vel, ang_vel


def car_pre_tick(cars: CarState, wheels: WheelsState, controls, geom,
                 wheels_cfg, mut, dt, respawn_pos_yaw):
    """One Car::_PreTickUpdate for a whole batch (Car.cpp:58-131).

    `respawn_pos_yaw` is ([..., 3] pos, [...] yaw) pre-sampled for cars that
    respawn this tick. Returns (cars', wheels', central_accel [..., 3],
    active mask).

    Demoed cars are fully masked out at the end; a car whose respawn timer
    expires this tick respawns and stays inactive until next tick (the
    reference disables its rigid body for the respawn tick, Car.cpp:69-87).
    """
    mass = wheels_cfg["mass"]
    controls = controls.clamped()
    jump_pressed = controls.jump & ~cars.last_controls.jump

    # --- demo / respawn bookkeeping ---
    demo_timer = jnp.where(
        cars.is_demoed, jnp.maximum(cars.demo_respawn_timer - dt, 0.0), 0.0)
    respawn_now = cars.is_demoed & (demo_timer == 0.0)
    was_demoed = cars.is_demoed

    cars = cars.replace(demo_respawn_timer=demo_timer)
    active = ~was_demoed

    # --- updateVehicleFirst: transforms, raycasts, friction impulse calc ---
    ray = dict(suspension_raycast(cars, wheels_cfg, geom))
    fric_forces = calc_friction_impulses(cars, wheels, ray, mass, dt)

    wheels_with_contact = ray["in_contact"]
    num_contact = jnp.sum(wheels_with_contact.astype(jnp.int32), axis=-1)
    is_on_ground = num_contact >= 3
    forward_speed = dot(cars.vel, cars.forward)
    abs_fwd = jnp.abs(forward_speed)

    central_accel = jnp.zeros_like(cars.vel)
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
    # throttling against motion: full brake, kill throttle above tiny speed
    real_brake = jnp.where(has_throttle & opposing, 1.0, real_brake)
    engine_throttle = jnp.where(
        has_throttle & opposing & (abs_fwd > C.BRAKING_NO_THROTTLE_SPEED_THRESH),
        0.0, engine_throttle)
    # coasting
    coasting_brake = jnp.where(abs_fwd < C.STOPPING_FORWARD_VEL,
                               1.0, C.COASTING_BRAKE_FACTOR)
    real_brake = jnp.where(~has_throttle, coasting_brake, real_brake)
    engine_throttle = jnp.where(~has_throttle, 0.0, engine_throttle)
    # handbrake keeps raw throttle, no brake
    real_brake = jnp.where(controls.handbrake, 0.0, real_brake)
    engine_throttle = jnp.where(controls.handbrake, real_throttle, engine_throttle)

    drive_speed_scale = jnp.where(num_contact < 3,
                                  drive_speed_scale / 4.0, drive_speed_scale)

    new_engine_force = engine_throttle * C.THROTTLE_TORQUE_AMOUNT * drive_speed_scale
    new_brake = real_brake * C.BRAKE_TORQUE_AMOUNT

    steer_angle = C.STEER_ANGLE_FROM_SPEED_CURVE(abs_fwd)
    ps_steer = C.POWERSLIDE_STEER_ANGLE_FROM_SPEED_CURVE(abs_fwd)
    steer_angle = steer_angle + (ps_steer - steer_angle) * handbrake_val
    new_steer = steer_angle * controls.steer

    # Friction scalars for next tick (Car.cpp:409-461)
    lat_dir, _ = _steered_axle_and_forward(cars, wheels.steer_angle)
    # NOTE: reference reads the wheel transform built this tick from last
    # tick's steer (updateWheelTransform before _UpdateWheels)
    lat_dir_w = lat_dir  # [..., 4, 3] steered +right
    n = ray["contact_normal"]
    long_dir = cross(lat_dir_w, n)
    wheel_delta = ray["hard_point"] - cars.pos[..., None, :]
    cross_vec = rb.velocity_at_point(
        cars.vel[..., None, :], cars.ang_vel[..., None, :], wheel_delta)
    base_friction = jnp.abs(dot(cross_vec, lat_dir_w))
    fci = jnp.where(
        base_friction > 5.0,
        base_friction / (jnp.abs(dot(cross_vec, long_dir)) + base_friction),
        0.0)
    lat_f = C.LAT_FRICTION_CURVE(fci)
    long_f = C.LONG_FRICTION_CURVE(fci)
    hb = handbrake_val[..., None]
    lat_f_hb = lat_f * ((C.HANDBRAKE_LAT_FRICTION_FACTOR_CURVE(fci) - 1) * hb + 1)
    long_f_hb = long_f * ((C.HANDBRAKE_LONG_FRICTION_FACTOR_CURVE(fci) - 1) * hb + 1)
    has_hb = handbrake_val > 0
    lat_f = jnp.where(has_hb[..., None], lat_f_hb, lat_f)
    long_f = jnp.where(has_hb[..., None], long_f_hb, jnp.ones_like(long_f))
    sticky = (real_throttle != 0)[..., None]
    non_sticky_scale = C.NON_STICKY_FRICTION_FACTOR_CURVE(n[..., 2])
    lat_f = jnp.where(sticky, lat_f, lat_f * non_sticky_scale)
    long_f = jnp.where(sticky, long_f, long_f * non_sticky_scale)
    # Only wheels with ground contact update their friction values
    keep = ~ray["in_contact"]
    lat_f = jnp.where(keep, wheels.lat_friction, lat_f)
    long_f = jnp.where(keep, wheels.long_friction, long_f)

    # Sticky force (Car.cpp:463-474)
    contact_n_sum = jnp.sum(
        jnp.where(ray["in_contact"][..., None], ray["contact_normal"], 0.0),
        axis=-2)
    any_contact = jnp.any(ray["in_contact"], axis=-1)
    upwards_dir = jnp.where(
        (norm(contact_n_sum) > 0)[..., None], normalized(contact_n_sum), cars.up)
    full_stick = (real_throttle != 0) | (abs_fwd > C.STOPPING_FORWARD_VEL)
    sticky_scale = 0.5 + jnp.where(full_stick,
                                   1 - jnp.abs(upwards_dir[..., 2]), 0.0)
    central_accel = central_accel + jnp.where(
        any_contact[..., None],
        upwards_dir * (sticky_scale * C.GRAVITY_Z)[..., None], 0.0)

    new_wheels = WheelsState(
        steer_angle=new_steer, engine_force=new_engine_force,
        brake=new_brake, lat_friction=lat_f, long_friction=long_f)

    # ============ _UpdateAirTorque (Car.cpp:556-641), when <3 wheels ========
    air = num_contact < 3
    is_flipping = jnp.where(air, cars.is_flipping, False)
    is_flipping = jnp.where(
        is_flipping, cars.has_flipped & (cars.flip_time < C.FLIP_TORQUE_TIME),
        is_flipping)

    dir_pitch = -cars.right
    dir_yaw = cars.up
    dir_roll = -cars.forward

    flip_torque_nonzero = jnp.any(cars.flip_rel_torque != 0, axis=-1)
    # Flip cancel: opposing pitch input scales pitch torque down
    rel_torque_y = cars.flip_rel_torque[..., 1]
    cancelling = (rel_torque_y != 0) & (controls.pitch != 0) & (
        jnp.sign(rel_torque_y) == jnp.sign(controls.pitch))
    pitch_scale_flip = jnp.where(
        cancelling, 1 - jnp.minimum(jnp.abs(controls.pitch), 1.0), 1.0)
    rel_torque = cars.flip_rel_torque * jnp.stack(
        [jnp.ones_like(pitch_scale_flip), pitch_scale_flip,
         jnp.ones_like(pitch_scale_flip)], axis=-1)
    dodge_torque_local = rel_torque * jnp.asarray(
        [C.FLIP_TORQUE_X, C.FLIP_TORQUE_Y, 0.0], dtype=jnp.float32)
    dodge_dw = jnp.einsum("...ij,...j->...i", cars.rot, dodge_torque_local) * dt
    apply_flip_torque = air & is_flipping & flip_torque_nonzero
    ang_vel = ang_vel + jnp.where(apply_flip_torque[..., None], dodge_dw, 0.0)

    do_air_control = (~is_flipping) | (is_flipping & ~flip_torque_nonzero) \
        | (is_flipping & cancelling)
    do_air_control = do_air_control & ~cars.is_auto_flipping & (num_contact == 0)

    # Extra pitch lock during/after flips
    pitch_torque_scale = jnp.where(
        is_flipping, 0.0,
        jnp.where(cars.has_flipped
                  & (cars.flip_time < C.FLIP_TORQUE_TIME + C.FLIP_PITCHLOCK_EXTRA_TIME),
                  0.0, 1.0))
    has_input = (controls.pitch != 0) | (controls.yaw != 0) | (controls.roll != 0)
    tq = (
        dir_pitch * (controls.pitch * pitch_torque_scale
                     * C.CAR_AIR_CONTROL_TORQUE[0])[..., None]
        + dir_yaw * (controls.yaw * C.CAR_AIR_CONTROL_TORQUE[1])[..., None]
        + dir_roll * (controls.roll * C.CAR_AIR_CONTROL_TORQUE[2])[..., None]
    )
    tq = jnp.where(has_input[..., None], tq, 0.0)
    damp_pitch = dot(dir_pitch, ang_vel) * C.CAR_AIR_CONTROL_DAMPING[0] \
        * (1 - jnp.abs(controls.pitch * pitch_torque_scale))
    damp_yaw = dot(dir_yaw, ang_vel) * C.CAR_AIR_CONTROL_DAMPING[1] \
        * (1 - jnp.abs(controls.yaw))
    damp_roll = dot(dir_roll, ang_vel) * C.CAR_AIR_CONTROL_DAMPING[2]
    damping = (dir_yaw * damp_yaw[..., None]
               + dir_pitch * damp_pitch[..., None]
               + dir_roll * damp_roll[..., None])
    air_dw = (tq - damping) * (C.CAR_TORQUE_SCALE * dt)
    ang_vel = ang_vel + jnp.where((air & do_air_control)[..., None], air_dw, 0.0)

    # Air throttle (Car.cpp:639-640)
    central_accel = central_accel + jnp.where(
        (air & (controls.throttle != 0))[..., None],
        cars.forward * (controls.throttle * C.THROTTLE_AIR_ACCEL)[..., None], 0.0)

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
    vel = vel + jnp.where(
        start_jump[..., None],
        cars.up * mut.jump_immediate_force, 0.0)

    has_jumped = jnp.where(is_jumping, True, has_jumped)
    jump_force_scale = jnp.where(jump_time < C.JUMP_MIN_TIME,
                                 C.JUMP_PRE_MIN_ACCEL_SCALE, 1.0)
    central_accel = central_accel + jnp.where(
        is_jumping[..., None],
        cars.up * (mut.jump_accel * jump_force_scale)[..., None], 0.0)
    jump_time = jnp.where(is_jumping | has_jumped, jump_time + dt, jump_time)

    # =================== _UpdateAutoFlip (Car.cpp:763-797) ==================
    _, _, roll_ang = rotmat_to_euler(cars.rot)
    autoflip_trigger = (
        jump_pressed & cars.has_world_contact
        & (cars.world_contact_normal[..., 2] > C.CAR_AUTOFLIP_NORMZ_THRESH)
        & (jnp.abs(roll_ang) > C.CAR_AUTOFLIP_ROLL_THRESH))
    auto_flip_timer = jnp.where(
        autoflip_trigger,
        C.CAR_AUTOFLIP_TIME * (jnp.abs(roll_ang) / jnp.pi),
        cars.auto_flip_timer)
    auto_flip_scale = jnp.where(
        autoflip_trigger, jnp.where(roll_ang > 0, 1.0, -1.0),
        cars.auto_flip_torque_scale)
    is_auto_flipping = cars.is_auto_flipping | autoflip_trigger
    vel = vel + jnp.where(
        autoflip_trigger[..., None], -cars.up * C.CAR_AUTOFLIP_IMPULSE, 0.0)

    af_done = is_auto_flipping & (auto_flip_timer <= 0)
    af_run = is_auto_flipping & (auto_flip_timer > 0)
    ang_vel = ang_vel + jnp.where(
        af_run[..., None],
        cars.forward * (C.CAR_AUTOFLIP_TORQUE * auto_flip_scale * dt)[..., None],
        0.0)
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
    is_flip_input = input_mag >= wheels_cfg["dodge_deadzone"]
    fresh = ~has_double_jumped & ~has_flipped
    can_use = jnp.where(is_flip_input,
                        fresh | mut.unlimited_flips,
                        fresh | mut.unlimited_double_jumps)
    can_use = can_use & ~is_auto_flipping & can_try

    do_flip = can_use & is_flip_input
    do_double_jump = can_use & ~is_flip_input

    # Flip start (Car.cpp:677-737)
    dodge_dir = jnp.stack(
        [-controls.pitch, controls.yaw + controls.roll,
         jnp.zeros_like(controls.pitch)], axis=-1)
    tiny = (jnp.abs(controls.yaw + controls.roll) < 0.1) \
        & (jnp.abs(controls.pitch) < 0.1)
    dodge_dir = jnp.where(tiny[..., None], 0.0, normalized(dodge_dir))
    new_rel_torque = jnp.stack(
        [-dodge_dir[..., 1], dodge_dir[..., 0],
         jnp.zeros_like(dodge_dir[..., 0])], axis=-1)
    dodge_dir = jnp.where(jnp.abs(dodge_dir) < 0.1, 0.0, dodge_dir)

    non_zero_dodge = jnp.any(dodge_dir != 0, axis=-1)
    fwd_ratio = abs_fwd / C.CAR_MAX_SPEED
    backwards = jnp.where(
        abs_fwd < 100.0, dodge_dir[..., 0] < 0.0,
        (dodge_dir[..., 0] >= 0.0) != (forward_speed >= 0.0))
    init_vel = dodge_dir * C.FLIP_INITIAL_VEL_SCALE
    max_scale_x = jnp.where(backwards,
                            C.FLIP_BACKWARD_IMPULSE_MAX_SPEED_SCALE,
                            C.FLIP_FORWARD_IMPULSE_MAX_SPEED_SCALE)
    scale_x = ((max_scale_x - 1) * fwd_ratio) + 1.0
    scale_x = scale_x * jnp.where(backwards, C.FLIP_BACKWARD_IMPULSE_SCALE_X, 1.0)
    scale_y = ((C.FLIP_SIDE_IMPULSE_MAX_SPEED_SCALE - 1) * fwd_ratio) + 1.0
    init_vel = init_vel * jnp.stack(
        [scale_x, scale_y, jnp.ones_like(scale_x)], axis=-1)
    fwd_ang = jnp.arctan2(cars.forward[..., 1], cars.forward[..., 0])
    ca, sa = jnp.cos(fwd_ang), jnp.sin(fwd_ang)
    delta_v = jnp.stack(
        [init_vel[..., 0] * ca - init_vel[..., 1] * sa,
         init_vel[..., 0] * sa + init_vel[..., 1] * ca,
         jnp.zeros_like(ca)], axis=-1)
    vel = vel + jnp.where((do_flip & non_zero_dodge)[..., None], delta_v, 0.0)

    flip_rel_torque = jnp.where(do_flip[..., None],
                                new_rel_torque, cars.flip_rel_torque)
    flip_time = jnp.where(do_flip, 0.0, flip_time)
    has_flipped = has_flipped | do_flip
    is_flipping = is_flipping | do_flip

    # Double jump
    vel = vel + jnp.where(do_double_jump[..., None],
                          cars.up * C.JUMP_IMMEDIATE_FORCE, 0.0)
    has_double_jumped = has_double_jumped | do_double_jump

    # Flip time advance + z damping (Car.cpp:749-760)
    flip_time = jnp.where(is_flipping | has_flipped, flip_time + dt, flip_time)
    damp_z = is_flipping & (flip_time <= C.FLIP_TORQUE_TIME) \
        & (flip_time >= C.FLIP_Z_DAMP_START) \
        & ((vel[..., 2] < 0) | (flip_time < C.FLIP_Z_DAMP_END))
    z_scale = (1 - C.FLIP_Z_DAMP_120) ** (dt * 120.0)
    vel = vel.at[..., 2].set(
        jnp.where(damp_z, vel[..., 2] * z_scale, vel[..., 2]))

    # =================== _UpdateAutoRoll (Car.cpp:799-833) ==================
    do_auto_roll = (controls.throttle != 0) & (
        ((num_contact > 0) & (num_contact < 4)) | cars.has_world_contact)
    ground_up = jnp.where(
        (num_contact > 0)[..., None], upwards_dir, cars.world_contact_normal)
    ground_down = -ground_up
    cross_right = cross(ground_up, cars.forward)
    cross_fwd = cross(ground_down, cross_right)
    right_factor = 1 - jnp.clip(dot(cars.right, cross_right), 0.0, 1.0)
    fwd_factor = 1 - jnp.clip(dot(cars.forward, cross_fwd), 0.0, 1.0)
    tq_dir_right = cars.forward * jnp.where(
        dot(cars.right, ground_up) >= 0, -1.0, 1.0)[..., None]
    tq_dir_fwd = cars.right * jnp.where(
        dot(cars.forward, ground_up) >= 0, 1.0, -1.0)[..., None]
    roll_tq = (tq_dir_right * right_factor[..., None]
               + tq_dir_fwd * fwd_factor[..., None])
    central_accel = central_accel + jnp.where(
        do_auto_roll[..., None], ground_down * C.CAR_AUTOROLL_FORCE, 0.0)
    ang_vel = ang_vel + jnp.where(
        do_auto_roll[..., None], roll_tq * (C.CAR_AUTOROLL_TORQUE * dt), 0.0)

    # world contact consumed (Car.cpp:125)
    has_world_contact = jnp.zeros_like(cars.has_world_contact)

    # ============ updateVehicleSecond: wheel impulses =======================
    vel2, ang_vel2 = apply_wheel_impulses(
        cars.replace(vel=vel, ang_vel=ang_vel), ray, fric_forces,
        wheels_cfg, dt)
    vel, ang_vel = vel2, ang_vel2

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
    central_accel = central_accel + jnp.where(
        boosting[..., None], cars.forward * boost_accel[..., None], 0.0)
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

    # Mask: demoed cars keep their previous state entirely
    new_cars = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(active, active.shape + (1,) * (new.ndim - active.ndim)),
            new, old),
        new_cars, cars)
    central_accel = jnp.where(active[..., None], central_accel, 0.0)

    # Respawn overwrites everything (Car::Respawn, Car.cpp:43-56 + SetState)
    spawn_pos, spawn_rot = respawn_pos_yaw
    respawned = CarState.zeros(new_cars.boost.shape,
                               boost=mut.car_spawn_boost_amount)
    respawned = respawned.replace(pos=spawn_pos, rot=spawn_rot)
    new_cars = jax.tree.map(
        lambda fresh, cur: jnp.where(
            jnp.reshape(respawn_now,
                        respawn_now.shape + (1,) * (fresh.ndim - respawn_now.ndim)),
            fresh, cur),
        respawned, new_cars)
    new_wheels = jax.tree.map(
        lambda new, old: jnp.where(
            jnp.reshape(active & ~respawn_now,
                        active.shape + (1,) * (new.ndim - active.ndim)),
            new, old),
        new_wheels, wheels)

    return new_cars, new_wheels, central_accel, active


def car_post_tick(cars: CarState, controls, dt):
    """Car::_PostTickUpdate (Car.cpp:133-163): supersonic hysteresis, car
    contact cooldown, last controls. Rot was already integrated."""
    speed_sq = dot(cars.vel, cars.vel)
    maintain = cars.is_supersonic \
        & (cars.supersonic_time < C.SUPERSONIC_MAINTAIN_MAX_TIME)
    is_ss = jnp.where(
        maintain,
        speed_sq >= C.SUPERSONIC_MAINTAIN_MIN_SPEED ** 2,
        speed_sq >= C.SUPERSONIC_START_SPEED ** 2)
    ss_time = jnp.where(is_ss, cars.supersonic_time + dt, 0.0)
    cooldown = jnp.where(cars.car_contact_cooldown_timer > 0,
                         jnp.maximum(cars.car_contact_cooldown_timer - dt, 0.0),
                         cars.car_contact_cooldown_timer)
    return cars.replace(
        is_supersonic=is_ss, supersonic_time=ss_time,
        car_contact_cooldown_timer=cooldown,
        last_controls=controls.clamped(),
    )


def car_finish_tick(cars: CarState, vel_impulse_cache, active):
    """Car::_FinishPhysicsTick (Car.cpp:165-193): apply the velocity impulse
    cache (bumps, demos excepted) then clamp speeds."""
    from rlgymppo_cpp_tpu.maths.vec import clamp_norm
    vel = cars.vel + jnp.where(active[..., None], vel_impulse_cache, 0.0)
    vel = clamp_norm(vel, C.CAR_MAX_SPEED)
    ang_vel = clamp_norm(cars.ang_vel, C.CAR_MAX_ANG_SPEED)
    vel = jnp.where(active[..., None], vel, cars.vel)
    ang_vel = jnp.where(active[..., None], ang_vel, cars.ang_vel)
    return cars.replace(vel=vel, ang_vel=ang_vel)
