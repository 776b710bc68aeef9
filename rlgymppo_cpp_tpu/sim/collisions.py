"""Dynamic-body contacts: car-world, car-ball, car-car.

Replaces bullet narrowphase + the contact-added callback routing
(Arena::_BulletContactAddedCallback and friends, Arena.cpp:218-427) with
dense vectorized tests: hitbox corners vs the plane soup for car-world,
sphere-vs-OBB for car-ball, and corner-vs-OBB both ways for car-car.
Edge-edge OBB contacts are not modeled (rare and soft in practice).

Bullet's default collision margin is 0.04 bt = 2 uu; box shapes are inflated
by it, and contacts activate at the margin surface.
"""

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import dot, cross, norm, normalized
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import rigidbody as rb

BOX_MARGIN = 2.0  # uu
MESH_MARGIN = 2.0  # uu

_CORNER_SIGNS = jnp.asarray(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)], dtype=jnp.float32)  # [8, 3]


def hitbox_corners(pos, rot, half_extents, offset):
    """World positions of the 8 margin-inflated hitbox corners [..., 8, 3]."""
    local = _CORNER_SIGNS * half_extents + offset  # [8, 3]
    return pos[..., None, :] + jnp.einsum("...ij,cj->...ci", rot, local)


def car_world_contacts(cars, geom, mut, inv_inertia_diag, half_extents,
                       offset, dt, active):
    """Car hitbox corners vs static world; sequential impulses over the 8
    corners like bullet's solver iterations.

    Returns (dvel, dang_vel, has_contact, contact_normal) — the last two feed
    CarState.world_contact (Arena.cpp:420-427).
    """
    mass = mut.car_mass
    inv_mass = 1.0 / mass
    inv_inertia_w = rb.inv_inertia_world(cars.rot, inv_inertia_diag)

    corners = hitbox_corners(cars.pos, cars.rot, half_extents, offset)
    dists = geom.signed_distances(corners)          # [..., 8, NP] via [..., 8, 3]
    # Deepest plane per corner
    depths_all = MESH_MARGIN - dists                # penetration past margin
    best = jnp.argmax(depths_all, axis=-1)
    depth = jnp.take_along_axis(depths_all, best[..., None], axis=-1)[..., 0]
    normal = geom.normals[best]                     # [..., 8, 3]
    in_contact = (depth > 0.0) & active[..., None]

    friction = mut.car_world_friction
    restitution = mut.car_world_restitution

    vel, ang_vel = cars.vel, cars.ang_vel
    # Sequential impulse pass over the corners
    for i in range(8):
        rel = corners[..., i, :] - cars.pos
        dvel, dang, _ = rb.contact_impulse_static(
            vel, ang_vel, inv_mass, inv_inertia_w,
            rel, normal[..., i, :], depth[..., i],
            restitution, friction, dt)
        m = in_contact[..., i:i + 1]
        vel = vel + jnp.where(m, dvel, 0.0)
        ang_vel = ang_vel + jnp.where(m, dang, 0.0)

    has_contact = jnp.any(in_contact, axis=-1)
    deepest = jnp.argmax(jnp.where(in_contact, depth, -jnp.inf), axis=-1)
    contact_normal = jnp.take_along_axis(
        normal, deepest[..., None, None], axis=-2)[..., 0, :]
    contact_normal = jnp.where(has_contact[..., None], contact_normal, 0.0)
    return vel - cars.vel, ang_vel - cars.ang_vel, has_contact, contact_normal


def _sphere_obb(ball_pos, car_pos, car_rot, half_extents, offset, radius):
    """Closest point of an OBB to a sphere center.

    Returns (contact_point world, normal box->sphere, depth) where depth > 0
    means contact (center within radius of the inflated box).
    """
    rel = ball_pos - car_pos
    local = jnp.einsum("...ji,...j->...i", car_rot, rel) - offset  # R^T rel
    clamped = jnp.clip(local, -half_extents, half_extents)
    delta = local - clamped
    dist = norm(delta)
    outside = dist > 1e-6

    # Center inside the box: push out through the nearest face
    face_dist = half_extents - jnp.abs(local)       # [..., 3]
    face_axis = jnp.argmin(face_dist, axis=-1)
    face_sign = jnp.sign(
        jnp.take_along_axis(local, face_axis[..., None], axis=-1))[..., 0]
    normal_in = jax.nn.one_hot(face_axis, 3, dtype=local.dtype) * face_sign[..., None]
    face_min = jnp.take_along_axis(
        face_dist, face_axis[..., None], axis=-1)[..., 0]
    inside_depth = face_min + radius

    normal_local = jnp.where(outside[..., None],
                             delta / jnp.maximum(dist, 1e-6)[..., None],
                             normal_in)
    depth = jnp.where(outside, radius - dist, inside_depth)
    contact_local = jnp.where(outside[..., None], clamped,
                              local + normal_in * face_min[..., None]) + offset
    normal_world = jnp.einsum("...ij,...j->...i", car_rot, normal_local)
    contact_world = car_pos + jnp.einsum(
        "...ij,...j->...i", car_rot, contact_local)
    return contact_world, normal_world, depth


def car_ball_contacts(cars, ball, mut, geom_mode, inv_inertia_diag,
                      half_extents, offset, dt, active, tick_count):
    """Car-ball contact + RocketSim's extra impulse
    (Arena::_BtCallback_OnCarBallCollision, Arena.cpp:283-334).

    Returns (car_dvel, car_dang, ball_dvel, ball_dang, ball_cache_impulse,
    hit_mask [..., P], ball_hit_updates dict).
    """
    P = cars.boost.shape[-1]
    ball_pos = ball.pos[..., None, :]                  # [..., 1, 3] vs [..., P]
    ball_pos = jnp.broadcast_to(ball_pos, cars.pos.shape)

    half = half_extents + BOX_MARGIN
    contact, normal, depth = _sphere_obb(
        ball_pos, cars.pos, cars.rot, half, offset, mut.ball_radius)
    hit = (depth > 0.0) & active

    inv_mass_car = 1.0 / mut.car_mass
    inv_mass_ball = 1.0 / mut.ball_mass
    inv_inertia_car = rb.inv_inertia_world(cars.rot, inv_inertia_diag)
    ball_ii = rb.sphere_inv_inertia_scalar(mut.ball_mass, mut.ball_radius)
    inv_inertia_ball = jnp.eye(3, dtype=jnp.float32) * ball_ii

    rel_car = contact - cars.pos
    rel_ball = contact - ball_pos
    ball_vel = jnp.broadcast_to(ball.vel[..., None, :], cars.vel.shape)
    ball_ang = jnp.broadcast_to(ball.ang_vel[..., None, :], cars.vel.shape)

    # Physical contact: callback overrides friction=2, restitution=0
    # (Arena.cpp:289-291); normal points box->sphere = toward ball (A=ball)
    dvel_b, dang_b, dvel_c, dang_c, _ = rb.contact_impulse_pair(
        ball_vel, ball_ang, inv_mass_ball, inv_inertia_ball, rel_ball,
        cars.vel, cars.ang_vel, inv_mass_car, inv_inertia_car, rel_car,
        normal, depth, C.CARBALL_COLLISION_RESTITUTION,
        C.CARBALL_COLLISION_FRICTION, dt)
    hit_m = hit[..., None]
    car_dvel = jnp.where(hit_m, dvel_c, 0.0)
    car_dang = jnp.where(hit_m, dang_c, 0.0)
    ball_dvel = jnp.sum(jnp.where(hit_m, dvel_b, 0.0), axis=-2)
    ball_dang = jnp.sum(jnp.where(hit_m, dang_b, 0.0), axis=-2)

    # --- extra impulse (once per 2 ticks per car) ---
    bhi = cars.ball_hit_info
    tick = tick_count[..., None]  # [..., 1] broadcast over P
    gate = (tick > bhi.tick_count_when_extra_impulse_applied + 1) \
        | (bhi.tick_count_when_extra_impulse_applied > tick)
    do_extra = hit & gate

    rel_pos = ball_pos - cars.pos
    rel_vel = ball_vel - cars.vel
    rel_speed = jnp.minimum(norm(rel_vel), C.BALL_CAR_EXTRA_IMPULSE_MAXDELTAVEL_UU)

    z_scale = C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE
    if geom_mode == C.GameMode.HOOPS:
        extra_z = cars.is_on_ground & (
            cars.up[..., 2] > C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE_HOOPS_NORMAL_Z_THRESH)
        z_scale = jnp.where(extra_z,
                            C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE_HOOPS_GROUND, z_scale)
        z_scale = z_scale[..., None] * jnp.asarray([0, 0, 1.0]) \
            + jnp.asarray([1.0, 1.0, 0.0])
    else:
        z_scale = jnp.asarray([1.0, 1.0, z_scale], dtype=jnp.float32)

    hit_dir = normalized(rel_pos * z_scale)
    fwd_adj = cars.forward * (dot(hit_dir, cars.forward)
                              * (1 - C.BALL_CAR_EXTRA_IMPULSE_FORWARD_SCALE))[..., None]
    hit_dir = normalized(hit_dir - fwd_adj)
    added_vel = hit_dir * (rel_speed
                           * C.BALL_CAR_EXTRA_IMPULSE_FACTOR_CURVE(rel_speed)
                           * mut.ball_hit_extra_force_scale)[..., None]
    added_vel = jnp.where((do_extra & (rel_speed > 0))[..., None], added_vel, 0.0)
    ball_cache_impulse = jnp.sum(added_vel, axis=-2)

    # BallHitInfo updates (Arena.cpp:293-309)
    new_bhi = bhi.replace(
        is_valid=bhi.is_valid | hit,
        relative_pos_on_ball=jnp.where(hit_m, contact - ball_pos,
                                       bhi.relative_pos_on_ball),
        ball_pos=jnp.where(hit_m, ball_pos, bhi.ball_pos),
        extra_hit_vel=jnp.where(hit_m, added_vel, bhi.extra_hit_vel),
        tick_count_when_hit=jnp.where(hit, tick, bhi.tick_count_when_hit),
        tick_count_when_extra_impulse_applied=jnp.where(
            do_extra, tick, bhi.tick_count_when_extra_impulse_applied),
    )
    return car_dvel, car_dang, ball_dvel, ball_dang, ball_cache_impulse, \
        hit, new_bhi


def car_car_contacts(cars, mut, inv_inertia_diag, half_extents, offset,
                     dt, active, teams):
    """Pairwise car-car contacts + bump/demo rules
    (Arena::_BtCallback_OnCarCarCollision, Arena.cpp:336-418).

    Contact detection is corner-vs-OBB both ways per ordered pair; the deeper
    directional test provides the manifold. The entry [i, j] of pair arrays
    reads "box of car i, corners of car j" for geometry, and "car i bumps
    car j" for the bump logic.

    Returns dict with:
      dvel, dang      [..., P, 3]  physical contact response
      bump            [..., P, P]  i bumped j this tick
      demo            [..., P, P]  i demoed j this tick
      victim_impulse  [..., P, 3]  bump impulse into each victim's cache
      bumper_other    [..., P]     new car_contact_other_idx for bumpers
      bumper_cooldown [..., P]     new car_contact_cooldown_timer
    """
    P = cars.boost.shape[-1]
    batch = cars.boost.shape[:-1]
    if P < 2:
        zeros3 = jnp.zeros_like(cars.vel)
        pp = jnp.zeros((*batch, P, P), dtype=bool)
        return {
            "dvel": zeros3, "dang": zeros3, "bump": pp, "demo": pp,
            "victim_impulse": zeros3,
            "bumper_other": cars.car_contact_other_idx,
            "bumper_cooldown": cars.car_contact_cooldown_timer,
        }

    half = half_extents + BOX_MARGIN
    corners = hitbox_corners(cars.pos, cars.rot, half, offset)  # [.., P, 8, 3]

    # corners of car j vs box of car i -> [.., P(i), P(j), 8, ...]
    corner_j = corners[..., None, :, :, :]
    pos_i = cars.pos[..., :, None, None, :]
    rot_i = cars.rot[..., :, None, None, :, :]
    local = jnp.einsum("...ji,...j->...i", rot_i, corner_j - pos_i) - offset
    face_dist = half - jnp.abs(local)                  # [.., P, P, 8, 3]
    inside = jnp.all(face_dist > 0.0, axis=-1)         # [.., P, P, 8]
    pen_per_corner = jnp.where(inside, jnp.min(face_dist, axis=-1), -1.0)

    best_c = jnp.argmax(pen_per_corner, axis=-1)       # [.., P, P]
    pen_dir = jnp.take_along_axis(pen_per_corner, best_c[..., None],
                                  axis=-1)[..., 0]
    corner_w = jnp.broadcast_to(corner_j, local.shape[:-1] + (3,))
    contact_dir = jnp.take_along_axis(
        corner_w, best_c[..., None, None], axis=-3)[..., 0, :]
    local_best = jnp.take_along_axis(
        local, best_c[..., None, None], axis=-3)[..., 0, :]

    # Face normal of box i at the deepest corner of j, pointing outward
    fd_best = jnp.take_along_axis(
        face_dist, best_c[..., None, None], axis=-3)[..., 0, :]
    axis_best = jnp.argmin(fd_best, axis=-1)
    sign_best = jnp.sign(jnp.take_along_axis(
        local_best, axis_best[..., None], axis=-1))[..., 0]
    n_local = jax.nn.one_hot(axis_best, 3, dtype=local.dtype) \
        * sign_best[..., None]
    normal_dir = jnp.einsum(
        "...ij,...j->...i", cars.rot[..., :, None, :, :], n_local)

    eye = jnp.eye(P, dtype=bool)
    both_active = active[..., :, None] & active[..., None, :] & ~eye
    hit_dir = (pen_dir > 0.0) & both_active            # [.., P, P]
    contact_ij = hit_dir | jnp.swapaxes(hit_dir, -1, -2)

    # Pick the deeper directional test per unordered pair
    pen_dir_m = jnp.where(hit_dir, pen_dir, -1.0)
    pen_T = jnp.swapaxes(pen_dir_m, -1, -2)
    use_this = pen_dir_m >= pen_T                      # entry [i,j] is deeper
    contact_T = jnp.swapaxes(contact_dir, -3, -2)
    normal_T = jnp.swapaxes(normal_dir, -3, -2)
    pen_pair = jnp.maximum(pen_dir_m, pen_T)
    contact_pt = jnp.where(use_this[..., None], contact_dir, contact_T)
    # normal from box side: entry [i,j] normal points i -> j when [i,j] used;
    # when [j,i] used, its normal points j -> i, so flip to keep i -> j
    normal_ij = jnp.where(use_this[..., None], normal_dir, -normal_T)

    inv_mass = 1.0 / mut.car_mass
    inv_inertia_w = rb.inv_inertia_world(cars.rot, inv_inertia_diag)
    vel_i = cars.vel[..., :, None, :]
    ang_i = cars.ang_vel[..., :, None, :]
    vel_j = cars.vel[..., None, :, :]
    ang_j = cars.ang_vel[..., None, :, :]
    rel_i = contact_pt - cars.pos[..., :, None, :]
    rel_j = contact_pt - cars.pos[..., None, :, :]
    ii_i = inv_inertia_w[..., :, None, :, :]
    ii_j = inv_inertia_w[..., None, :, :, :]

    # contact_impulse_pair expects normal B -> A; A = j, B = i here
    dvel_j_, dang_j_, dvel_i_, dang_i_, _ = rb.contact_impulse_pair(
        vel_j, ang_j, inv_mass, ii_j, rel_j,
        vel_i, ang_i, inv_mass, ii_i, rel_i,
        normal_ij, jnp.maximum(pen_pair, 0.0),
        C.CARCAR_COLLISION_RESTITUTION, C.CARCAR_COLLISION_FRICTION, dt)

    # Resolve each unordered pair once (upper triangle)
    triu = jnp.triu(jnp.ones((P, P), dtype=bool), 1)
    resolve = contact_ij & triu
    m = resolve[..., None]
    dvel = (jnp.sum(jnp.where(m, dvel_i_, 0.0), axis=-2)       # as car i
            + jnp.sum(jnp.where(jnp.swapaxes(resolve, -1, -2)[..., None],
                                jnp.swapaxes(dvel_j_, -3, -2), 0.0), axis=-2))
    dang = (jnp.sum(jnp.where(m, dang_i_, 0.0), axis=-2)
            + jnp.sum(jnp.where(jnp.swapaxes(resolve, -1, -2)[..., None],
                                jnp.swapaxes(dang_j_, -3, -2), 0.0), axis=-2))

    # ---------------- bump / demo rules (ordered: i bumps j) ----------------
    either_demoed = cars.is_demoed[..., :, None] | cars.is_demoed[..., None, :]
    idx = jnp.arange(P, dtype=jnp.int32)
    in_cooldown = (cars.car_contact_other_idx[..., :, None] == idx) \
        & (cars.car_contact_cooldown_timer[..., :, None] > 0)

    delta_pos = cars.pos[..., None, :, :] - cars.pos[..., :, None, :]  # i -> j
    towards = dot(vel_i, delta_pos) > 0
    vel_dir_i = normalized(vel_i)
    dir_to_other = normalized(delta_pos)
    speed_towards = dot(vel_i, dir_to_other)
    away_speed = dot(vel_j, vel_dir_i)
    gaining = speed_towards > away_speed

    local_on_i = jnp.einsum(
        "...ji,...j->...i", cars.rot[..., :, None, :, :],
        contact_pt - cars.pos[..., :, None, :])
    with_bumper = local_on_i[..., 0] > C.BUMP_MIN_FORWARD_DIST

    bump = contact_ij & ~either_demoed & ~in_cooldown & towards & gaining \
        & with_bumper

    demo_mode = int(mut.demo_mode)
    if demo_mode == 1:        # ON_CONTACT
        is_demo = bump
    elif demo_mode == 2:      # DISABLED
        is_demo = jnp.zeros_like(bump)
    else:                     # NORMAL
        is_demo = bump & cars.is_supersonic[..., :, None]
    if not mut.enable_team_demos:
        # Same-team "demos" downgrade to plain bumps (Arena.cpp:387-388)
        is_demo = is_demo & (teams[:, None] != teams[None, :])

    # Bump impulse into victim j (non-demo bumps)
    ground_hit = cars.is_on_ground[..., None, :]   # victim on ground
    base_scale = jnp.where(
        ground_hit, C.BUMP_VEL_AMOUNT_GROUND_CURVE(speed_towards),
        C.BUMP_VEL_AMOUNT_AIR_CURVE(speed_towards))
    up_j = cars.up[..., None, :, :]
    world_up = jnp.zeros_like(up_j) + jnp.asarray([0.0, 0.0, 1.0])
    hit_up_dir = jnp.where(ground_hit[..., None], up_j, world_up)
    bump_impulse = vel_dir_i * base_scale[..., None] + hit_up_dir * (
        C.BUMP_UPWARD_VEL_AMOUNT_CURVE(speed_towards)
        * mut.bump_force_scale)[..., None]
    plain_bump = bump & ~is_demo
    victim_impulse = jnp.sum(
        jnp.where(plain_bump[..., None], bump_impulse, 0.0), axis=-3)

    # Bumper cooldown bookkeeping: last victim index wins (reference iterates)
    any_bump = jnp.any(bump, axis=-1)
    victim_idx = jnp.argmax(
        jnp.where(bump, idx, -1), axis=-1).astype(jnp.int32)
    bumper_other = jnp.where(any_bump, victim_idx, cars.car_contact_other_idx)
    bumper_cooldown = jnp.where(any_bump, mut.bump_cooldown_time,
                                cars.car_contact_cooldown_timer)
    return {
        "dvel": dvel, "dang": dang, "bump": bump, "demo": is_demo,
        "victim_impulse": victim_impulse,
        "bumper_other": bumper_other, "bumper_cooldown": bumper_cooldown,
    }
