"""Ball physics: drag, world bounce, Heatseeker homing.

Replicates Ball::_PreTickUpdate/_FinishPhysicsTick (RocketSim
src/Sim/Ball/Ball.cpp:112-253) and the "special" averaged ball-world contact
RocketSim adds to bullet (btSequentialImpulseConstraintSolver.cpp:1163-1212):
all ball-world contact points of a tick collapse into one averaged contact
with no positional correction, which is why the ball rests at
BALL_REST_Z=93.15 (radius + mesh collision margin) rather than its radius.

Snowday's puck is approximated as a sphere of PUCK_RADIUS for now (the
reference uses a convex cylinder hull, Ball.cpp:51-81).
"""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import dot, norm, normalized, clamp_norm
from rlgymppo_cpp_tpu.maths.rot import (
    angle_from_vec, forward_vec_from_angle, round_angle_ue3, wrap_normalize,
)
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import rigidbody as rb
from rlgymppo_cpp_tpu.sim.state import BallState

# Contact margin between ball sphere and arena mesh (bullet mesh margin
# 0.04 bt = 2 uu minus sphere margin bookkeeping); chosen so the resting
# height matches BALL_REST_Z exactly (RLConst.h:37).
BALL_CONTACT_MARGIN = C.BALL_REST_Z - C.BALL_COLLISION_RADIUS_SOCCAR


def ball_pre_tick(ball: BallState, game_mode, dt):
    """Ball::_PreTickUpdate (Ball.cpp:152-201): Heatseeker homing."""
    if game_mode != C.GameMode.HEATSEEKER:
        return ball

    hs = ball.hs_info
    has_target = hs.y_target_dir != 0

    vel_yaw, vel_pitch = angle_from_vec(ball.vel)
    goal_target = jnp.stack([
        jnp.zeros_like(hs.y_target_dir),
        C.Heatseeker.TARGET_Y * hs.y_target_dir,
        jnp.full_like(hs.y_target_dir, C.Heatseeker.TARGET_Z)], axis=-1)
    to_goal = goal_target - ball.pos
    goal_yaw, goal_pitch = angle_from_vec(to_goal)

    d_yaw = wrap_normalize(goal_yaw - vel_yaw, jnp.pi)
    d_pitch = wrap_normalize(goal_pitch - vel_pitch, jnp.pi / 2)

    cur_speed = norm(ball.vel)
    speed_ratio = cur_speed / C.Heatseeker.MAX_SPEED
    base = speed_ratio * dt
    new_yaw = vel_yaw + d_yaw * base * C.Heatseeker.HORIZONTAL_BLEND
    new_pitch = vel_pitch + d_pitch * base * C.Heatseeker.VERTICAL_BLEND
    new_yaw = wrap_normalize(new_yaw, jnp.pi)
    new_pitch = wrap_normalize(new_pitch, jnp.pi / 2)
    new_pitch = jnp.clip(new_pitch,
                         -C.Heatseeker.MAX_TURN_PITCH, C.Heatseeker.MAX_TURN_PITCH)
    new_yaw, new_pitch = round_angle_ue3(new_yaw, new_pitch)

    new_speed = cur_speed + (hs.cur_target_speed - cur_speed) \
        * C.Heatseeker.SPEED_BLEND
    new_vel = forward_vec_from_angle(new_yaw, new_pitch) * new_speed[..., None]

    vel = jnp.where(has_target[..., None], new_vel, ball.vel)
    time_since_hit = jnp.where(has_target, hs.time_since_hit + dt,
                               hs.time_since_hit)
    return ball.replace(
        vel=vel, hs_info=hs.replace(time_since_hit=time_since_hit))


def ball_world_contact(ball: BallState, geom, mut, dt, sleeping):
    """The special averaged ball-world contact (one solver iteration).

    Returns (dvel, dang_vel, hit_mask, hit_normal) — the normal is needed by
    Heatseeker/Snowday _OnWorldCollision logic.
    """
    radius = mut.ball_radius + BALL_CONTACT_MARGIN
    depth, normal = geom.sphere_contact(ball.pos, radius)
    in_contact = (depth > 0.0) & ~sleeping

    inv_mass = 1.0 / mut.ball_mass
    inv_inertia = rb.sphere_inv_inertia_scalar(mut.ball_mass, mut.ball_radius)
    inv_inertia_w = jnp.eye(3, dtype=jnp.float32) * inv_inertia
    rel_pos = -normal * mut.ball_radius

    # Combined material with a static body: min friction, max restitution
    # (RocketSim-modified btManifoldResult.cpp:56-78)
    friction = min(mut.ball_world_friction, C.ARENA_COLLISION_FRICTION)
    restitution = max(mut.ball_world_restitution, C.ARENA_COLLISION_RESTITUTION)

    dvel, dang, _ = rb.contact_impulse_static(
        ball.vel, ball.ang_vel, inv_mass, inv_inertia_w,
        rel_pos, normal, depth, restitution, friction, dt,
        use_position_bias=False)  # special contacts skip positional bias
    dvel = jnp.where(in_contact[..., None], dvel, 0.0)
    dang = jnp.where(in_contact[..., None], dang, 0.0)
    return dvel, dang, in_contact, normal


def ball_on_world_collision(ball: BallState, normal, hit, game_mode, dt):
    """Ball::_OnWorldCollision (Ball.cpp:217-253). Returns
    (ball', extra velocity impulse to cache)."""
    impulse = jnp.zeros_like(ball.vel)
    if game_mode == C.GameMode.HEATSEEKER:
        hs = ball.hs_info
        rel_normal_y = normal[..., 1] * hs.y_target_dir
        rel_y = ball.pos[..., 1] * hs.y_target_dir
        flip = hit & (hs.y_target_dir != 0) \
            & (rel_normal_y <= -C.Heatseeker.WALL_BOUNCE_CHANGE_Y_NORMAL) \
            & (rel_y >= C.ARENA_EXTENT_Y - C.Heatseeker.WALL_BOUNCE_CHANGE_Y_THRESH)
        new_dir = jnp.where(flip, -hs.y_target_dir, hs.y_target_dir)
        goal_target = jnp.stack([
            jnp.zeros_like(new_dir), C.Heatseeker.TARGET_Y * new_dir,
            jnp.full_like(new_dir, C.Heatseeker.TARGET_Z)], axis=-1)
        dir_to_goal = normalized(goal_target - ball.pos)
        up = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
        bounce_dir = dir_to_goal * (1 - C.Heatseeker.WALL_BOUNCE_UP_FRAC) \
            + up * C.Heatseeker.WALL_BOUNCE_UP_FRAC
        bounce = bounce_dir * (norm(ball.vel)
                               * C.Heatseeker.WALL_BOUNCE_FORCE_SCALE)[..., None]
        impulse = jnp.where(flip[..., None], bounce, 0.0)
        ball = ball.replace(hs_info=hs.replace(y_target_dir=new_dir))
    elif game_mode == C.GameMode.SNOWDAY:
        # Puck ground stick: -normal * force applied once per tick
        # (force, so integrated with dt and divided by mass)
        accel = -normal * (C.Snowday.PUCK_GROUND_STICK_FORCE
                           / C.Snowday.PUCK_MASS_BT)
        impulse = jnp.where(hit[..., None], accel * dt, 0.0)
    return ball, impulse


def ball_finish_tick(ball: BallState, vel_impulse_cache, mut):
    """Ball::_FinishPhysicsTick (Ball.cpp:112-138): apply impulse cache,
    clamp speeds."""
    vel = clamp_norm(ball.vel + vel_impulse_cache, mut.ball_max_speed)
    ang_vel = clamp_norm(ball.ang_vel, C.BALL_MAX_ANG_SPEED)
    return ball.replace(vel=vel, ang_vel=ang_vel)
