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
    """Ball-world contact. Returns (dvel, dang, dpos, hit, normal).

    Non-snowday balls get the averaged "special" contact (no positional
    correction, dpos = 0); Snowday routes to the regular-solver 20-gon
    puck manifold (puck_world_contact)."""
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
        zero, in_contact, normal


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


def puck_hull_verts_near(ball, mut, toward: V3):
    """World positions of the 20-gon hull vertices nearest a world-space
    direction `toward` (center -> wall): the vertex whose body-frame angle
    snaps to the direction's angle, its two ring neighbors on the same
    (near) face, and the same-angle vertex of the far face. The hull is
    40 points at angles k*18 deg, z=+-h/2 (MakeBallCollisionShape,
    Ball.cpp:56-71), and the phase is known exactly because the puck's
    full rotation is tracked. Returns a list of 4 V3 world points."""
    r = mut.ball_radius
    hh = C.Snowday.PUCK_HEIGHT / 2.0
    axis = ball.rot.u                      # body z
    c = toward.dot(axis)
    sign_c = jnp.where(c >= 0, 1.0, -1.0)
    # body-frame ring angle of the radial part of `toward`
    bx = toward.dot(ball.rot.f)
    by = toward.dot(ball.rot.r)
    step = 2.0 * jnp.pi / C.Snowday.PUCK_CIRCLE_POINT_AMOUNT
    phi = fastmath.atan2(by, bx)
    k0 = jnp.round(phi / step)
    pts = []
    for dk, far in ((-1.0, False), (0.0, False), (1.0, False), (0.0, True)):
        ang = (k0 + dk) * step
        z = hh * (-sign_c if not far else sign_c)
        local = V3(r * jnp.cos(ang), r * jnp.sin(ang),
                   jnp.broadcast_to(z, ang.shape))
        pts.append(ball.pos + ball.rot.mv(local))
    return pts


def puck_world_contact(ball, geom, mut, dt, sleeping):
    """Snowday puck vs world. The reference's puck is a 20-gon cylinder
    convex hull (Ball.cpp:51-81), and — unlike every other ball — its
    world contacts are NOT marked "special" (Arena.cpp:270-272 skips the
    m_isSpecial flag in SNOWDAY), so bullet resolves the full manifold
    with the regular sequential-impulse solver + split-impulse positional
    recovery. Modeled here exactly like car-world contacts
    (core_collisions.car_world_contacts): one sequential impulse per
    manifold vertex, positional push-out from the deepest point.

    The manifold points are the hull's own vertices nearest the wall
    (exact, since the puck's rotation is tracked): snapped ring vertex +
    its two ring neighbors on the near face + the same-angle far-face
    vertex — flat rest engages the near ring (bullet's 4-point persistent
    face manifold), side-lying the near/far pair (contact line), tilted
    contact the single deepest vertex.

    Returns (dvel, dang, dpos, hit, normal) — dpos is the split-impulse
    push-out (soccar/heatseeker special contacts have none by design).
    """
    # direction toward the wall from the center sample
    _, normal_c = geom.sphere_contact_core(ball.pos, 0.0)
    pts = puck_hull_verts_near(ball, mut, normal_c * -1.0)

    inv_mass = 1.0 / mut.ball_mass
    ii_apply = rb.make_box_ii(ball.rot, puck_inv_inertia_diag(mut))
    friction = min(mut.ball_world_friction, C.ARENA_COLLISION_FRICTION)
    restitution = max(mut.ball_world_restitution,
                      C.ARENA_COLLISION_RESTITUTION)

    zero = V3.of(0.0, 0.0, 0.0)
    vel, ang_vel = ball.vel, ball.ang_vel
    hit = jnp.zeros(sleeping.shape, bool)
    best_depth = jnp.full(sleeping.shape, -jnp.inf)
    normal = V3.zeros(sleeping.shape)
    for p in pts:
        d_i, n_i = geom.sphere_contact_core(p, BALL_CONTACT_MARGIN)
        pen = (d_i > 0.0) & ~sleeping
        dvel, dang, _ = rb.contact_impulse_static(
            vel, ang_vel, inv_mass, ii_apply,
            p - ball.pos, n_i, d_i, restitution, friction, dt,
            use_position_bias=False)
        vel = vel + vwhere(pen, dvel, zero)
        ang_vel = ang_vel + vwhere(pen, dang, zero)
        hit = hit | pen
        deeper = pen & (d_i > best_depth)
        best_depth = jnp.where(deeper, d_i, best_depth)
        normal = vwhere(deeper, n_i, normal)

    # split impulse: m_erp2 = 0.8, linearSlop 0 (bullet default — the
    # reference puck rests with its low vertices exactly at margin
    # height, recorder trace rest z = 33.15 = h/2 + margin)
    push = 0.8 * jnp.maximum(best_depth, 0.0)
    dpos = vwhere(hit, normal * push, zero)
    return vel - ball.vel, ang_vel - ball.ang_vel, dpos, hit, normal


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
