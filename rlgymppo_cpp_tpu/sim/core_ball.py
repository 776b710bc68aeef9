"""Ball physics on the env-last component core (port of sim/ball.py:
Ball::_PreTickUpdate/_FinishPhysicsTick + the averaged ball-world contact,
RocketSim src/Sim/Ball/Ball.cpp:112-253)."""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths import fastmath
from rlgymppo_cpp_tpu.maths.v3 import V3, vwhere
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import core_rb as rb

BALL_CONTACT_MARGIN = C.BALL_REST_Z - C.BALL_COLLISION_RADIUS_SOCCAR
EPS = 1.1920929e-07


def _wrap_normalize(val, minmax):
    result = jnp.fmod(val, minmax * 2)
    result = jnp.where(result > minmax, result - minmax * 2, result)
    result = jnp.where(result < -minmax, result + minmax * 2, result)
    return result


def _round_angle_ue3(yaw, pitch):
    to_ints = jnp.float32((1 << 15) / jnp.pi)
    back = (1.0 / to_ints) * 4.0
    mask = 0x4000 - 1
    r_yaw = (yaw * to_ints).astype(jnp.int32) >> 2 & mask
    r_pitch = (pitch * to_ints).astype(jnp.int32) >> 2 & mask
    return r_yaw.astype(jnp.float32) * back, \
        r_pitch.astype(jnp.float32) * back


def _angle_from_vec(v: V3):
    nonzero_2d = (jnp.abs(v.x) > EPS) | (jnp.abs(v.y) > EPS)
    yaw = jnp.where(nonzero_2d, fastmath.atan2(v.y, v.x), 0.0)
    dist2d = jnp.sqrt(v.x * v.x + v.y * v.y)
    pitch_2d = fastmath.atan2(v.z, dist2d)
    pitch_axis = jnp.where(v.z > EPS, jnp.pi / 2,
                           jnp.where(v.z < -EPS, -jnp.pi / 2, 0.0))
    pitch = jnp.where(nonzero_2d, pitch_2d, pitch_axis)
    return yaw, pitch


def ball_pre_tick(ball, game_mode, dt):
    """Heatseeker homing (Ball.cpp:152-201)."""
    if game_mode != C.GameMode.HEATSEEKER:
        return ball

    hs = ball.hs_info
    has_target = hs.y_target_dir != 0

    vel_yaw, vel_pitch = _angle_from_vec(ball.vel)
    goal_target = V3(jnp.zeros_like(hs.y_target_dir),
                     C.Heatseeker.TARGET_Y * hs.y_target_dir,
                     jnp.full_like(hs.y_target_dir, C.Heatseeker.TARGET_Z))
    to_goal = goal_target - ball.pos
    goal_yaw, goal_pitch = _angle_from_vec(to_goal)

    d_yaw = _wrap_normalize(goal_yaw - vel_yaw, jnp.pi)
    d_pitch = _wrap_normalize(goal_pitch - vel_pitch, jnp.pi / 2)

    cur_speed = ball.vel.norm()
    speed_ratio = cur_speed / C.Heatseeker.MAX_SPEED
    base = speed_ratio * dt
    new_yaw = vel_yaw + d_yaw * base * C.Heatseeker.HORIZONTAL_BLEND
    new_pitch = vel_pitch + d_pitch * base * C.Heatseeker.VERTICAL_BLEND
    new_yaw = _wrap_normalize(new_yaw, jnp.pi)
    new_pitch = jnp.clip(_wrap_normalize(new_pitch, jnp.pi / 2),
                         -C.Heatseeker.MAX_TURN_PITCH,
                         C.Heatseeker.MAX_TURN_PITCH)
    new_yaw, new_pitch = _round_angle_ue3(new_yaw, new_pitch)

    new_speed = cur_speed + (hs.cur_target_speed - cur_speed) \
        * C.Heatseeker.SPEED_BLEND
    cp, sp = jnp.cos(new_pitch), jnp.sin(new_pitch)
    cy, sy = jnp.cos(new_yaw), jnp.sin(new_yaw)
    new_vel = V3(cp * cy, cp * sy, sp) * new_speed

    vel = vwhere(has_target, new_vel, ball.vel)
    time_since_hit = jnp.where(has_target, hs.time_since_hit + dt,
                               hs.time_since_hit)
    return ball.replace(
        vel=vel, hs_info=hs.replace(time_since_hit=time_since_hit))


def ball_world_contact(ball, geom, mut, dt, sleeping,
                       game_mode=C.GameMode.SOCCAR):
    """Averaged ball-world contact. Returns (dvel, dang, hit, normal).

    Snowday routes to the cylinder puck shape (puck_world_contact)."""
    if game_mode == C.GameMode.SNOWDAY:
        return puck_world_contact(ball, geom, mut, dt, sleeping)
    radius = mut.ball_radius + BALL_CONTACT_MARGIN
    depth, normal = geom.sphere_contact_core(ball.pos, radius)
    in_contact = (depth > 0.0) & ~sleeping

    inv_mass = 1.0 / mut.ball_mass
    ii_apply = rb.make_sphere_ii(
        rb.sphere_inv_inertia_scalar(mut.ball_mass, mut.ball_radius))
    rel_pos = normal * -mut.ball_radius

    friction = min(mut.ball_world_friction, C.ARENA_COLLISION_FRICTION)
    restitution = max(mut.ball_world_restitution,
                      C.ARENA_COLLISION_RESTITUTION)

    dvel, dang, _ = rb.contact_impulse_static(
        ball.vel, ball.ang_vel, inv_mass, ii_apply,
        rel_pos, normal, depth, restitution, friction, dt,
        use_position_bias=False)
    zero = V3.of(0.0, 0.0, 0.0)
    return vwhere(in_contact, dvel, zero), vwhere(in_contact, dang, zero), \
        in_contact, normal


def puck_inv_inertia_diag(mut):
    """Body-frame inverse inertia of the puck cylinder (bullet derives it
    from the 20-point convex hull, MakeBallCollisionShape Ball.cpp:52-76;
    the analytic solid cylinder matches to within the hull's 20-gon
    approximation): axis = body z."""
    m = mut.ball_mass
    r = mut.ball_radius
    h = C.Snowday.PUCK_HEIGHT
    ixx = m * (3.0 * r * r + h * h) / 12.0
    izz = 0.5 * m * r * r
    return (1.0 / ixx, 1.0 / ixx, 1.0 / izz)


def puck_world_contact(ball, geom, mut, dt, sleeping):
    """Snowday puck vs world: the reference's puck is a 20-gon cylinder
    convex hull (Ball.cpp:51-81; radius/height/mass/friction/restitution
    from RLConst::Snowday). Here the cylinder's support point against the
    deepest world plane is computed analytically: support distance along
    the contact normal n with axis a is r*|n_perp| + (h/2)*|n.a|, contact
    offset -(r*u_hat + (h/2)*sign(n.a)*a). Single-point impulse with the
    cylinder's rotated inertia tensor replaces bullet's hull manifold —
    rim contact, flat rest at h/2, edge bounces and spin coupling all
    follow from the same formula.
    """
    r = mut.ball_radius
    hh = C.Snowday.PUCK_HEIGHT / 2.0

    # nearest world plane at the center (probe radius 0: depth = -distance)
    depth_c, normal = geom.sphere_contact_core(ball.pos, 0.0)
    dist = -depth_c

    axis = ball.rot.u                      # cylinder axis (body z)
    c = normal.dot(axis)
    n_perp = normal - axis * c
    s = n_perp.norm()
    u_hat = n_perp / jnp.maximum(s, 1e-6)
    support = r * s + hh * jnp.abs(c)
    depth = (support + BALL_CONTACT_MARGIN) - dist
    in_contact = (depth > 0.0) & ~sleeping

    sign_c = jnp.where(c >= 0, 1.0, -1.0)
    rel_pos = u_hat * (-r * jnp.minimum(s * 1e6, 1.0)) \
        + axis * (-hh * sign_c)

    inv_mass = 1.0 / mut.ball_mass
    ii_apply = rb.make_box_ii(ball.rot, puck_inv_inertia_diag(mut))

    friction = min(mut.ball_world_friction, C.ARENA_COLLISION_FRICTION)
    restitution = max(mut.ball_world_restitution,
                      C.ARENA_COLLISION_RESTITUTION)

    dvel, dang, _ = rb.contact_impulse_static(
        ball.vel, ball.ang_vel, inv_mass, ii_apply,
        rel_pos, normal, depth, restitution, friction, dt,
        use_position_bias=False)
    zero = V3.of(0.0, 0.0, 0.0)
    return vwhere(in_contact, dvel, zero), vwhere(in_contact, dang, zero), \
        in_contact, normal


def ball_on_world_collision(ball, normal, hit, game_mode, dt):
    """Ball::_OnWorldCollision (Ball.cpp:217-253)."""
    zero = V3.of(0.0, 0.0, 0.0)
    impulse = V3.zeros(hit.shape)
    if game_mode == C.GameMode.HEATSEEKER:
        hs = ball.hs_info
        rel_normal_y = normal.y * hs.y_target_dir
        rel_y = ball.pos.y * hs.y_target_dir
        flip = hit & (hs.y_target_dir != 0) \
            & (rel_normal_y <= -C.Heatseeker.WALL_BOUNCE_CHANGE_Y_NORMAL) \
            & (rel_y >= C.ARENA_EXTENT_Y
               - C.Heatseeker.WALL_BOUNCE_CHANGE_Y_THRESH)
        new_dir = jnp.where(flip, -hs.y_target_dir, hs.y_target_dir)
        goal_target = V3(jnp.zeros_like(new_dir),
                         C.Heatseeker.TARGET_Y * new_dir,
                         jnp.full_like(new_dir, C.Heatseeker.TARGET_Z))
        dir_to_goal = (goal_target - ball.pos).normalized()
        bounce_dir = dir_to_goal * (1 - C.Heatseeker.WALL_BOUNCE_UP_FRAC) \
            + V3.of(0.0, 0.0, 1.0) * C.Heatseeker.WALL_BOUNCE_UP_FRAC
        bounce = bounce_dir * (ball.vel.norm()
                               * C.Heatseeker.WALL_BOUNCE_FORCE_SCALE)
        impulse = vwhere(flip, bounce, zero)
        ball = ball.replace(hs_info=hs.replace(y_target_dir=new_dir))
    elif game_mode == C.GameMode.SNOWDAY:
        accel = normal * (-C.Snowday.PUCK_GROUND_STICK_FORCE
                          / C.Snowday.PUCK_MASS_BT)
        impulse = vwhere(hit, accel * dt, zero)
    return ball, impulse


def ball_finish_tick(ball, vel_impulse_cache, mut):
    """Ball::_FinishPhysicsTick (Ball.cpp:112-138)."""
    vel = (ball.vel + vel_impulse_cache).clamp_norm(mut.ball_max_speed)
    ang_vel = ball.ang_vel.clamp_norm(C.BALL_MAX_ANG_SPEED)
    return ball.replace(vel=vel, ang_vel=ang_vel)
