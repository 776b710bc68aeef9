"""Dynamic-body contacts on the env-last component core.

Port of sim/collisions.py (Arena::_BulletContactAddedCallback routing,
Arena.cpp:218-427) to V3/M3 [aux..., P, N] layout. Pairwise car-car arrays
are [P_i, P_j, N]; per-corner arrays carry a leading 8-axis.
"""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.v3 import V3, vwhere
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import core_rb as rb

BOX_MARGIN = 2.0
MESH_MARGIN = 2.0

_SIGNS = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
          for sz in (-1.0, 1.0)]


def _corner_signs():
    import numpy as np
    s = np.asarray(_SIGNS, np.float32)    # [8, 3]
    return V3(jnp.asarray(s[:, 0]).reshape(8, 1, 1),
              jnp.asarray(s[:, 1]).reshape(8, 1, 1),
              jnp.asarray(s[:, 2]).reshape(8, 1, 1))


def _v3_take0(v: V3, idx):
    """Gather along axis 0 with an index of shape v.x.shape[1:]."""
    return V3(jnp.take_along_axis(v.x, idx[None], axis=0)[0],
              jnp.take_along_axis(v.y, idx[None], axis=0)[0],
              jnp.take_along_axis(v.z, idx[None], axis=0)[0])


def hitbox_corners(pos: V3, rot, half, offset):
    """8 margin-inflated hitbox corners, V3 [8, P, N]."""
    signs = _corner_signs()
    local = V3(signs.x * half[0] + offset[0],
               signs.y * half[1] + offset[1],
               signs.z * half[2] + offset[2])
    return pos + rot.mv(local)


# Split-impulse penetration recovery (the reference forces bullet onto
# this path: solverInfo.m_splitImpulsePenetrationThreshold = 1e30 +
# m_erp2 = 0.8, Arena.cpp:485-488): penetration is resolved POSITIONALLY,
# never injected as velocity — a car spawned/settled slightly inside the
# world must not pop (the round-2 auto_flip golden trace caught exactly
# that: a Baumgarte velocity bias launched the roof-resting car upward).
SPLIT_IMPULSE_ERP = 0.8
PENETRATION_SLOP = 1.0


def car_world_contacts(cars, geom, mut, ii_diag, half, offset, dt, active,
                       geom_ctx=None):
    """Hitbox corners vs static world, sequential impulses over the 8
    corners. Returns (dvel V3, dang V3, dpos V3, has_contact,
    contact_normal V3); dpos is the split-impulse positional push-out.

    `geom_ctx`: optional shared per-car grid context (MeshGeom) — the
    tick's single per-car row serves all 8 corner queries, replacing this
    function's own two (top/bottom) row gathers."""
    inv_mass = 1.0 / mut.car_mass
    ii_apply = rb.make_box_ii(cars.rot, ii_diag)

    friction = mut.car_world_friction
    restitution = mut.car_world_restitution
    zero = V3.of(0.0, 0.0, 0.0)

    vel, ang_vel = cars.vel, cars.ang_vel
    has_contact = jnp.zeros_like(active)
    best_depth = jnp.full(active.shape, -jnp.inf)
    contact_normal = V3.zeros(active.shape)
    # Grid-backed geoms (MeshGeom): TWO row gathers per car (at the world-z
    # levels of the top and bottom corner planes) serve all 8 corner
    # queries from registers — each corner statically picks the row of its
    # own z sign, so the thin z-cells (~35 uu at soccar resolution) are
    # never extrapolated across. Gathers are the mesh world's entire cost
    # (scripts/mesh_profile.py), so this is 4x fewer rows + no dirs rows.
    ctx_top = ctx_bot = None
    if geom_ctx is not None:
        ctx_top = ctx_bot = geom_ctx
    elif getattr(geom, "fast", False) and hasattr(geom, "local_ctx_core"):
        zero2 = jnp.zeros_like(cars.pos.x)
        dz = jnp.abs(cars.rot.mv(V3.of(0.0, 0.0, half[2])).z) \
            + abs(offset[2])
        ctx_top = geom.local_ctx_core(
            cars.pos + V3(zero2, zero2, dz), for_car=True)
        ctx_bot = geom.local_ctx_core(
            cars.pos + V3(zero2, zero2, -dz), for_car=True)

    # Depth/normal of all 8 corners in ONE vectorized geometry pass
    # ([8, P, N] leading corner axis): the plane/grid evaluation loop is
    # by far the op-count bulk of this function, and the tick is
    # op-ISSUE-bound on small [P, N] arrays (scripts/tick_profile.py), so
    # folding the corners into the array instead of the Python loop cuts
    # its issue count 8x for identical math. Corner depths depend only on
    # the pre-solve pose, so hoisting them out of the sequential impulse
    # loop is exact.
    corners = hitbox_corners(cars.pos, cars.rot, half, offset)  # [8, P, N]
    if ctx_top is not None:
        # _SIGNS orders sz fastest: even indices are bottom corners
        bot = V3(corners.x[0::2], corners.y[0::2], corners.z[0::2])
        top = V3(corners.x[1::2], corners.y[1::2], corners.z[1::2])
        dist_b, normal_b = geom.eval_local_core(ctx_bot, bot)
        dist_t, normal_t = geom.eval_local_core(ctx_top, top)
        depth8 = jnp.stack(
            [MESH_MARGIN - dist_b, MESH_MARGIN - dist_t],
            axis=1).reshape((8,) + dist_b.shape[1:])
        def _ilv(a, b):
            return jnp.stack([a, b], axis=1).reshape(
                (8,) + a.shape[1:])
        normal8 = V3(_ilv(normal_b.x, normal_t.x),
                     _ilv(normal_b.y, normal_t.y),
                     _ilv(normal_b.z, normal_t.z))
    else:
        depth8, normal8 = geom.sphere_contact_core(corners, MESH_MARGIN,
                                                   for_car=True)

    # One sequential impulse per corner (bullet solver-iteration analog)
    for k in range(8):
        corner = V3(corners.x[k], corners.y[k], corners.z[k])
        depth = depth8[k]
        normal = V3(normal8.x[k], normal8.y[k], normal8.z[k])
        in_contact = (depth > 0.0) & active

        rel = corner - cars.pos
        dvel, dang, _ = rb.contact_impulse_static(
            vel, ang_vel, inv_mass, ii_apply,
            rel, normal, depth, restitution, friction, dt,
            use_position_bias=False)
        vel = vel + vwhere(in_contact, dvel, zero)
        ang_vel = ang_vel + vwhere(in_contact, dang, zero)

        has_contact = has_contact | in_contact
        deeper = in_contact & (depth > best_depth)
        best_depth = jnp.where(deeper, depth, best_depth)
        contact_normal = vwhere(deeper, normal, contact_normal)

    push = SPLIT_IMPULSE_ERP * jnp.maximum(
        best_depth - PENETRATION_SLOP, 0.0)
    dpos = vwhere(has_contact, contact_normal * push, zero)
    return vel - cars.vel, ang_vel - cars.ang_vel, dpos, has_contact, \
        contact_normal


def _sphere_obb(ball_pos: V3, car_pos: V3, car_rot, half, offset, radius):
    """Closest point of an OBB to a sphere center.
    Returns (contact V3 world, normal V3 box->sphere, depth)."""
    rel = ball_pos - car_pos
    local = car_rot.tmv(rel) - V3.of(*offset)
    clamped = V3(jnp.clip(local.x, -half[0], half[0]),
                 jnp.clip(local.y, -half[1], half[1]),
                 jnp.clip(local.z, -half[2], half[2]))
    delta = local - clamped
    dist = delta.norm()
    outside = dist > 1e-6

    face_dist = V3(half[0] - jnp.abs(local.x), half[1] - jnp.abs(local.y),
                   half[2] - jnp.abs(local.z))
    fd = jnp.stack([face_dist.x, face_dist.y, face_dist.z], axis=0)
    face_axis = jnp.argmin(fd, axis=0)
    face_min = jnp.min(fd, axis=0)
    sign_of = jnp.sign(jnp.where(face_axis == 0, local.x,
                                 jnp.where(face_axis == 1, local.y,
                                           local.z)))
    normal_in = V3((face_axis == 0) * sign_of, (face_axis == 1) * sign_of,
                   (face_axis == 2) * sign_of)

    normal_local = vwhere(outside, delta * (1.0 / jnp.maximum(dist, 1e-6)),
                          normal_in)
    depth = jnp.where(outside, radius - dist, face_min + radius)
    contact_local = vwhere(outside, clamped,
                           local + normal_in * face_min) + V3.of(*offset)
    normal_world = car_rot.mv(normal_local)
    contact_world = car_pos + car_rot.mv(contact_local)
    return contact_world, normal_world, depth


def car_ball_contacts(cars, ball, mut, geom_mode, ii_diag, half_extents,
                      offset, dt, active, tick_count):
    """Car-ball contact + extra impulse (Arena.cpp:283-334).

    Returns (car_dvel V3 [P,N], car_dang, ball_dvel V3 [N], ball_dang,
    ball_dpos V3 [N] split-impulse push-out, ball_cache V3 [N], hit [P,N],
    new ball_hit_info)."""
    half = tuple(h + BOX_MARGIN for h in half_extents)
    ball_pos = ball.pos                        # V3 [N] -> bcast vs [P, N]
    if geom_mode == C.GameMode.SNOWDAY:
        # Puck vs car box: the reference collides the 20-gon cylinder
        # hull against the hitbox with bullet's convex-convex manifold
        # (Ball.cpp:51-81). Deepest-feature test both ways, exactly the
        # two feature classes a GJK/EPA pair query can return here:
        #   (a) hull vertex inside the (margin-inflated) box — all 40
        #       20-gon vertices tested, phase exact from the tracked rot;
        #   (b) box corner inside the (margin-inflated) cylinder.
        # The deeper of the two wins the single solver point.
        from rlgymppo_cpp_tpu.sim.core_ball import puck_inv_inertia_diag
        import numpy as np
        r_puck = mut.ball_radius
        hh = C.Snowday.PUCK_HEIGHT / 2.0
        # Onset calibration vs bullet's GJK pair (box core = half - 2,
        # hull core = points): contact exists when core distance <
        # marginA + marginB + breaking threshold = 2 + 2 + 1. With the
        # box already inflated by BOX_MARGIN (+2), the hull side needs
        # +3 more than its own 2 uu margin to fire on the same tick as
        # the recorder (head-on hit at 1364 uu/s = 11.4 uu/tick).
        HULL_MARGIN = 5.0

        # (a) 40 hull vertices vs box: verts [40,1,1] -> world [40,1|P,N]
        n_ring = C.Snowday.PUCK_CIRCLE_POINT_AMOUNT
        ang = np.arange(n_ring) * (2.0 * np.pi / n_ring)
        vx = np.repeat(np.cos(ang) * 1.0, 2)
        vy = np.repeat(np.sin(ang) * 1.0, 2)
        vz = np.tile([1.0, -1.0], n_ring)
        vlocal = V3(jnp.asarray(vx, jnp.float32).reshape(-1, 1, 1) * r_puck,
                    jnp.asarray(vy, jnp.float32).reshape(-1, 1, 1) * r_puck,
                    jnp.asarray(vz, jnp.float32).reshape(-1, 1, 1) * hh)
        verts_w = ball_pos + ball.rot.mv(vlocal)       # [40, 1, N]
        contact_a, normal_a, depth_a = _sphere_obb(
            verts_w, cars.pos, cars.rot, half, offset, HULL_MARGIN)
        ia = jnp.argmax(depth_a, axis=0)               # [P, N]
        depth_va = jnp.take_along_axis(depth_a, ia[None], axis=0)[0]
        contact_va = _v3_take0(contact_a, ia)
        normal_va = _v3_take0(normal_a, ia)

        # (b) 8 box corners vs cylinder (corner in puck body frame)
        corners = hitbox_corners(cars.pos, cars.rot, half, offset)
        local_c = ball.rot.tmv(corners - ball_pos)     # [8, P, N]
        rho = jnp.sqrt(jnp.maximum(
            local_c.x ** 2 + local_c.y ** 2, 1e-12))
        d_side = (r_puck + HULL_MARGIN) - rho
        d_face = (hh + HULL_MARGIN) - jnp.abs(local_c.z)
        depth_b = jnp.minimum(d_side, d_face)          # >0 <=> inside
        rho_dir = ball.rot.mv(V3(local_c.x / rho, local_c.y / rho,
                                 jnp.zeros_like(rho)))
        axis_w = ball.rot.u
        sign_z = jnp.where(local_c.z >= 0, 1.0, -1.0)
        n_side = rho_dir * -1.0                        # ball moves inward
        n_face = axis_w * -sign_z
        normal_b = vwhere(d_side < d_face, n_side, n_face)

        def v3_at(v, i):
            return V3(v.x[i], v.y[i], v.z[i])

        # (c) cylinder SIDE vs box face/edge — the dominant car-puck
        # feature (a hitbox meets the tall flat puck side-on with its
        # front face EDGE, which neither hull vertices nor box corners
        # catch: the verts pass above/below the box, the corners outside
        # the circle). Closest point Q of the box to the puck's axis
        # segment, sampled at 7 axial stations; contact when
        # |Q - axis point| < r + margin, normal = Q -> axis.
        side_cands = []
        for frac in (-1.0, -2.0 / 3, -1.0 / 3, 0.0, 1.0 / 3, 2.0 / 3, 1.0):
            ax_pt = ball_pos + axis_w * (hh * frac)
            q, _, qdepth = _sphere_obb(
                ax_pt, cars.pos, cars.rot, half, offset, 0.0)
            # qdepth = -(distance from ax_pt to box surface); penetrating
            # axis points (qdepth > 0) mean deep overlap — the radial
            # formula still holds with Q the nearest surface point
            dvec = ax_pt - q
            dlen = dvec.norm()
            sep = jnp.where(qdepth > 0.0, -dlen, dlen)
            d_c = (r_puck + HULL_MARGIN) - sep
            n_c = dvec / jnp.maximum(dlen, 1e-6)
            n_c = vwhere(qdepth > 0.0, n_c * -1.0, n_c)
            # only valid while Q is radially beside the cylinder, not
            # past its flat faces: the axial offset of Q must be within
            # the sampled station's face bounds
            z_q = (q - ball_pos).dot(axis_w)
            valid = jnp.abs(z_q) <= hh + 1e-3
            d_c = jnp.where(valid, d_c, -1.0)
            side_cands.append((q, n_c, d_c))

        # Single deepest feature across all three classes: bullet's GJK
        # pair query returns ONE closest-point pair per narrowphase
        # update, and the recorded head-on hit shows the solver resolving
        # essentially that one point (car impulse ~90% of the single-
        # point full stop; a multi-point manifold here over-resolves to
        # the common velocity, +20% puck speed vs the trace).
        all_c = [(contact_va, normal_va, depth_va)] + [
            (v3_at(corners, i), v3_at(normal_b, i), depth_b[i])
            for i in range(8)] + side_cands
        d_stack = jnp.stack([d for _, _, d in all_c])
        ic = jnp.argmax(d_stack, axis=0)
        c_stack = V3(jnp.stack([c.x for c, _, _ in all_c]),
                     jnp.stack([c.y for c, _, _ in all_c]),
                     jnp.stack([c.z for c, _, _ in all_c]))
        n_stack = V3(jnp.stack([n.x for _, n, _ in all_c]),
                     jnp.stack([n.y for _, n, _ in all_c]),
                     jnp.stack([n.z for _, n, _ in all_c]))
        cands = [(_v3_take0(c_stack, ic), _v3_take0(n_stack, ic),
                  jnp.take_along_axis(d_stack, ic[None], axis=0)[0])]
        ii_ball = rb.make_box_ii(ball.rot, puck_inv_inertia_diag(mut))
    else:
        cands = [_sphere_obb(
            ball_pos, cars.pos, cars.rot, half, offset, mut.ball_radius)]
        ii_ball = rb.make_sphere_ii(
            rb.sphere_inv_inertia_scalar(mut.ball_mass, mut.ball_radius))

    inv_mass_car = 1.0 / mut.car_mass
    inv_mass_ball = 1.0 / mut.ball_mass
    ii_car = rb.make_box_ii(cars.rot, ii_diag)
    zero = V3.of(0.0, 0.0, 0.0)

    # Sequential impulses over the manifold points (per car-ball pair),
    # iterated a few passes: bullet's solver runs 10 iterations over the
    # persistent manifold and fully stops the approach velocity at every
    # point in ONE tick; a single pass under-resolves off-center contacts
    # (the rotational terms in the denominator eat part of the impulse and
    # the recorded head-on hit took 3 ticks to transfer what the reference
    # moved in one). Impulses are clamped >= 0 per pass, so iterating is
    # monotone and converges to the same full-stop fixed point. The
    # deepest point carries the split-impulse push-out + BallHitInfo.
    vel_b, ang_b = ball.vel, ball.ang_vel       # [N] -> [P, N] on first add
    vel_c, ang_c = cars.vel, cars.ang_vel
    hit = jnp.zeros(active.shape, bool)
    best_depth = jnp.full(active.shape, -jnp.inf)
    contact = V3.zeros(active.shape)
    normal = V3.zeros(active.shape)
    SOLVER_PASSES = 1
    for _ in range(SOLVER_PASSES):
        for ct, n, d in cands:
            pen = (d > 0.0) & active
            dvel_b, dang_b, dvel_c, dang_c, _ = rb.contact_impulse_pair(
                vel_b, ang_b, inv_mass_ball, ii_ball, ct - ball_pos,
                vel_c, ang_c, inv_mass_car, ii_car, ct - cars.pos,
                n, d, C.CARBALL_COLLISION_RESTITUTION,
                C.CARBALL_COLLISION_FRICTION, dt)
            vel_b = vel_b + vwhere(pen, dvel_b, zero)
            ang_b = ang_b + vwhere(pen, dang_b, zero)
            vel_c = vel_c + vwhere(pen, dvel_c, zero)
            ang_c = ang_c + vwhere(pen, dang_c, zero)
            hit = hit | pen
            deeper = pen & (d > best_depth)
            best_depth = jnp.where(deeper, d, best_depth)
            contact = vwhere(deeper, ct, contact)
            normal = vwhere(deeper, n, normal)
    depth = best_depth

    car_dvel = vel_c - cars.vel
    car_dang = ang_c - cars.ang_vel
    ball_dvel = (vel_b - ball.vel).sum(axis=0)
    ball_dang = (ang_b - ball.ang_vel).sum(axis=0)
    # split-impulse positional separation: the (much lighter) ball takes
    # the push-out, along the contact normal (car->ball)
    push = SPLIT_IMPULSE_ERP * jnp.maximum(depth - PENETRATION_SLOP, 0.0)
    ball_dpos = vwhere(hit, normal * push, zero).sum(axis=0)

    # --- extra impulse (once per 2 ticks per car, Arena.cpp:293-334) ---
    bhi = cars.ball_hit_info
    tick = tick_count                           # [N] bcast vs [P, N]
    gate = (tick > bhi.tick_count_when_extra_impulse_applied + 1) \
        | (bhi.tick_count_when_extra_impulse_applied > tick)
    do_extra = hit & gate

    rel_pos = ball_pos - cars.pos
    rel_vel = ball.vel - cars.vel
    rel_speed = jnp.minimum(rel_vel.norm(),
                            C.BALL_CAR_EXTRA_IMPULSE_MAXDELTAVEL_UU)

    if geom_mode == C.GameMode.HOOPS:
        extra_z = cars.is_on_ground & (
            cars.rot.u.z
            > C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE_HOOPS_NORMAL_Z_THRESH)
        z_scale = jnp.where(extra_z,
                            C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE_HOOPS_GROUND,
                            C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE)
    else:
        z_scale = C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE

    hit_dir = V3(rel_pos.x, rel_pos.y, rel_pos.z * z_scale).normalized()
    fwd = cars.rot.f
    fwd_adj = fwd * (hit_dir.dot(fwd)
                     * (1 - C.BALL_CAR_EXTRA_IMPULSE_FORWARD_SCALE))
    hit_dir = (hit_dir - fwd_adj).normalized()
    added_vel = hit_dir * (rel_speed
                           * C.BALL_CAR_EXTRA_IMPULSE_FACTOR_CURVE(rel_speed)
                           * mut.ball_hit_extra_force_scale)
    added_vel = vwhere(do_extra & (rel_speed > 0), added_vel, zero)
    ball_cache_impulse = added_vel.sum(axis=0)

    new_bhi = bhi.replace(
        is_valid=bhi.is_valid | hit,
        relative_pos_on_ball=vwhere(hit, contact - ball_pos,
                                    bhi.relative_pos_on_ball),
        ball_pos=vwhere(hit, ball_pos + (cars.pos * 0.0), bhi.ball_pos),
        extra_hit_vel=vwhere(hit, added_vel, bhi.extra_hit_vel),
        tick_count_when_hit=jnp.where(
            hit, jnp.broadcast_to(tick, hit.shape),
            bhi.tick_count_when_hit),
        tick_count_when_extra_impulse_applied=jnp.where(
            do_extra, jnp.broadcast_to(tick, hit.shape),
            bhi.tick_count_when_extra_impulse_applied),
    )
    return car_dvel, car_dang, ball_dvel, ball_dang, ball_dpos, \
        ball_cache_impulse, hit, new_bhi


def _vswap(v: V3) -> V3:
    return V3(jnp.swapaxes(v.x, 0, 1), jnp.swapaxes(v.y, 0, 1),
              jnp.swapaxes(v.z, 0, 1))


def car_car_contacts(cars, mut, ii_diag, half_extents, offset, dt, active,
                     teams):
    """Pairwise car-car contacts + bump/demo rules (Arena.cpp:336-418).
    Pair arrays are [P_i, P_j, N]: geometry "box of i vs corners of j",
    bump logic "i bumps j"."""
    P, N = active.shape
    zero = V3.of(0.0, 0.0, 0.0)
    if P < 2:
        z3 = V3.zeros((P, N))
        pp = jnp.zeros((P, P, N), bool)
        return {
            "dvel": z3, "dang": z3, "dpos": z3, "bump": pp, "demo": pp,
            "victim_impulse": z3,
            "bumper_other": cars.car_contact_other_idx,
            "bumper_cooldown": cars.car_contact_cooldown_timer,
        }

    half = tuple(h + BOX_MARGIN for h in half_extents)
    pos_i = cars.pos.expand(1)                        # [P_i, 1, N]
    rot_i = cars.rot.expand(1)

    pair_shape = (P, P, N)
    # corners of j vs box of i: ONE vectorized pass on [8, P_i, P_j, N]
    # (the tick is op-issue-bound on small arrays — scripts/
    # tick_profile.py — so the 8 corners ride the leading axis instead of
    # a Python loop), then a 3-level tournament picks the deepest corner.
    corners_j = hitbox_corners(cars.pos, cars.rot, half, offset)
    corner_j = V3(corners_j.x[:, None], corners_j.y[:, None],
                  corners_j.z[:, None])                  # [8, 1, Pj, N]
    local = rot_i.tmv(corner_j - pos_i) - V3.of(*offset)  # [8, Pi, Pj, N]
    face_dist = V3(half[0] - jnp.abs(local.x),
                   half[1] - jnp.abs(local.y),
                   half[2] - jnp.abs(local.z))
    inside = (face_dist.x > 0) & (face_dist.y > 0) & (face_dist.z > 0)
    min_fd = jnp.minimum(face_dist.x,
                         jnp.minimum(face_dist.y, face_dist.z))
    pen = jnp.where(inside, min_fd, -1.0)

    corner_b = V3(jnp.broadcast_to(corner_j.x, pen.shape),
                  jnp.broadcast_to(corner_j.y, pen.shape),
                  jnp.broadcast_to(corner_j.z, pen.shape))
    pen_dir, contact_dir, local_best, fd_best = pen, corner_b, local, \
        face_dist
    while pen_dir.shape[0] > 1:
        h = pen_dir.shape[0] // 2
        better = pen_dir[h:] > pen_dir[:h]
        # Strict > makes the lower half win ties within each halving
        # round. For non-adjacent tied maxima this can pick a different
        # corner than a sequential first-wins chain would (e.g. ties at
        # indices 1 and 2 fold to 2) — acceptable: exact ties on float
        # penetration depth are measure-zero in live physics, and the
        # golden traces pass either way.
        pen_dir = jnp.where(better, pen_dir[h:], pen_dir[:h])
        contact_dir = vwhere(better,
                             V3(contact_dir.x[h:], contact_dir.y[h:],
                                contact_dir.z[h:]),
                             V3(contact_dir.x[:h], contact_dir.y[:h],
                                contact_dir.z[:h]))
        local_best = vwhere(better,
                            V3(local_best.x[h:], local_best.y[h:],
                               local_best.z[h:]),
                            V3(local_best.x[:h], local_best.y[:h],
                               local_best.z[:h]))
        fd_best = vwhere(better,
                         V3(fd_best.x[h:], fd_best.y[h:], fd_best.z[h:]),
                         V3(fd_best.x[:h], fd_best.y[:h], fd_best.z[:h]))
    pen_dir = pen_dir[0]
    contact_dir = V3(contact_dir.x[0], contact_dir.y[0], contact_dir.z[0])
    local_best = V3(local_best.x[0], local_best.y[0], local_best.z[0])
    fd_best = V3(fd_best.x[0], fd_best.y[0], fd_best.z[0])

    axis_is_x = (fd_best.x <= fd_best.y) & (fd_best.x <= fd_best.z)
    axis_is_y = ~axis_is_x & (fd_best.y <= fd_best.z)
    axis_is_z = ~axis_is_x & ~axis_is_y
    sign_best = jnp.sign(jnp.where(axis_is_x, local_best.x,
                                   jnp.where(axis_is_y, local_best.y,
                                             local_best.z)))
    n_local = V3(axis_is_x * sign_best, axis_is_y * sign_best,
                 axis_is_z * sign_best)
    normal_dir = rot_i.mv(n_local)                    # [Pi, Pj, N]

    # --- SAT fallback over the 6 face axes -------------------------------
    # Two identical aligned boxes (head-on bumps between same-model cars,
    # THE common case) overlap face-to-face with every corner exactly ON
    # the other box's face planes — the corner-in-box test above never
    # fires. Bullet's box-box SAT manifold handles this; here the 6 face
    # axes (cross-axis edge-edge contacts are negligible for car bumps)
    # give penetration + normal, and the contact point is the other box's
    # center clamped into this box.
    rot_j_sat = cars.rot.expand(0)
    center_i = (cars.pos + cars.rot.mv(V3.of(*offset))).expand(1)
    center_j = (cars.pos + cars.rot.mv(V3.of(*offset))).expand(0)
    d_ij = center_j - center_i

    sat_pen = jnp.full(pair_shape, jnp.inf)
    sat_normal = V3.zeros(pair_shape)
    for axes_rot in (rot_i, rot_j_sat):
        for a in (axes_rot.f, axes_rot.r, axes_rot.u):
            ri = (half[0] * jnp.abs(a.dot(rot_i.f))
                  + half[1] * jnp.abs(a.dot(rot_i.r))
                  + half[2] * jnp.abs(a.dot(rot_i.u)))
            rj = (half[0] * jnp.abs(a.dot(rot_j_sat.f))
                  + half[1] * jnp.abs(a.dot(rot_j_sat.r))
                  + half[2] * jnp.abs(a.dot(rot_j_sat.u)))
            dist = a.dot(d_ij)
            overlap = ri + rj - jnp.abs(dist)
            better = overlap < sat_pen
            sat_pen = jnp.where(better, overlap, sat_pen)
            signed = a * jnp.where(dist >= 0, 1.0, -1.0)
            sat_normal = vwhere(better, signed, sat_normal)

    # contact point: j's center clamped into i's box (world frame)
    local_cj = rot_i.tmv(d_ij)
    clamped = V3(jnp.clip(local_cj.x, -half[0], half[0]),
                 jnp.clip(local_cj.y, -half[1], half[1]),
                 jnp.clip(local_cj.z, -half[2], half[2]))
    sat_contact = center_i + rot_i.mv(clamped)

    use_sat = (pen_dir <= 0.0) & (sat_pen > 0.0)
    pen_dir = jnp.where(use_sat, sat_pen, pen_dir)
    contact_dir = vwhere(use_sat, sat_contact, contact_dir)
    normal_dir = vwhere(use_sat, sat_normal, normal_dir)

    eye = jnp.eye(P, dtype=bool)[..., None]
    both_active = active[:, None] & active[None, :] & ~eye
    hit_dir = (pen_dir > 0.0) & both_active
    contact_ij = hit_dir | jnp.swapaxes(hit_dir, 0, 1)

    pen_dir_m = jnp.where(hit_dir, pen_dir, -1.0)
    pen_T = jnp.swapaxes(pen_dir_m, 0, 1)
    use_this = pen_dir_m >= pen_T
    contact_T = _vswap(contact_dir)
    normal_T = _vswap(normal_dir)
    pen_pair = jnp.maximum(pen_dir_m, pen_T)
    contact_pt = vwhere(use_this, contact_dir, contact_T)
    normal_ij = vwhere(use_this, normal_dir, -normal_T)

    inv_mass = 1.0 / mut.car_mass
    rot_j = cars.rot.expand(0)
    ii_i = rb.make_box_ii(rot_i, ii_diag)
    ii_j = rb.make_box_ii(rot_j, ii_diag)
    vel_i, ang_i = cars.vel.expand(1), cars.ang_vel.expand(1)
    vel_j, ang_j = cars.vel.expand(0), cars.ang_vel.expand(0)
    rel_i = contact_pt - cars.pos.expand(1)
    rel_j = contact_pt - cars.pos.expand(0)

    dvel_j_, dang_j_, dvel_i_, dang_i_, _ = rb.contact_impulse_pair(
        vel_j, ang_j, inv_mass, ii_j, rel_j,
        vel_i, ang_i, inv_mass, ii_i, rel_i,
        normal_ij, jnp.maximum(pen_pair, 0.0),
        C.CARCAR_COLLISION_RESTITUTION, C.CARCAR_COLLISION_FRICTION, dt)

    # Face-face (SAT) contacts resolve as a rigid multi-point manifold in
    # bullet — the 4+ solver points make the response translation-
    # dominant. A single point with the full inertia denominator both
    # softens the impulse (~25% low on head-on bumps vs the recorded
    # reference) and adds spurious spin, so SAT contacts use a
    # linear-only impulse instead.
    def ii_zero(v):
        return V3(v.x * 0.0, v.y * 0.0, v.z * 0.0)

    dvel_j_lin, _dj, dvel_i_lin, _di, _ = rb.contact_impulse_pair(
        vel_j, ang_j, inv_mass, ii_zero, rel_j,
        vel_i, ang_i, inv_mass, ii_zero, rel_i,
        normal_ij, jnp.maximum(pen_pair, 0.0),
        C.CARCAR_COLLISION_RESTITUTION, C.CARCAR_COLLISION_FRICTION, dt)
    dvel_j_ = vwhere(use_sat, dvel_j_lin, dvel_j_)
    dvel_i_ = vwhere(use_sat, dvel_i_lin, dvel_i_)
    dang_j_ = vwhere(use_sat, ii_zero(dang_j_), dang_j_)
    dang_i_ = vwhere(use_sat, ii_zero(dang_i_), dang_i_)
    # Alternatives measured against the golden car_bump/car_demo traces
    # and rejected: (a) a clipped-incident-face manifold with ONE
    # sequential-impulse pass (the first corner takes the full stop
    # impulse with its torque -> spurious spin, car_bump 16 -> 168 uu);
    # (b) the same manifold solved properly with projected Gauss-Seidel
    # (accumulated clamped impulses, 4 iterations) converges to within
    # 1 uu of THIS linear-only model on car_bump and is slightly worse
    # on car_demo -- the multi-point face manifold is translation-
    # dominant, which is exactly what linear-only encodes, at 1/50th
    # the arithmetic.

    triu = jnp.triu(jnp.ones((P, P), dtype=bool), 1)[..., None]
    resolve = contact_ij & triu
    resolve_T = jnp.swapaxes(resolve, 0, 1)
    dvel = (vwhere(resolve, dvel_i_, zero).sum(axis=1)
            + vwhere(resolve_T, _vswap(dvel_j_), zero).sum(axis=1))
    dang = (vwhere(resolve, dang_i_, zero).sum(axis=1)
            + vwhere(resolve_T, _vswap(dang_j_), zero).sum(axis=1))
    # split-impulse separation: equal masses, half the push-out each
    # (normal_ij points i -> j)
    push = SPLIT_IMPULSE_ERP * 0.5 * jnp.maximum(
        pen_pair - PENETRATION_SLOP, 0.0)
    dpos_i_ = normal_ij * -push
    dpos_j_ = normal_ij * push
    dpos = (vwhere(resolve, dpos_i_, zero).sum(axis=1)
            + vwhere(resolve_T, _vswap(dpos_j_), zero).sum(axis=1))

    # ---------------- bump / demo rules (i bumps j) ----------------
    either_demoed = cars.is_demoed[:, None] | cars.is_demoed[None, :]
    idx = jnp.arange(P, dtype=jnp.int32)
    in_cooldown = (cars.car_contact_other_idx[:, None] == idx[None, :, None]) \
        & (cars.car_contact_cooldown_timer[:, None] > 0)

    delta_pos = cars.pos.expand(0) - cars.pos.expand(1)   # i -> j
    towards = vel_i.dot(delta_pos) > 0
    vel_dir_i = vel_i.normalized()
    dir_to_other = delta_pos.normalized()
    speed_towards = vel_i.dot(dir_to_other)
    away_speed = vel_j.dot(vel_dir_i)
    gaining = speed_towards > away_speed

    local_on_i = rot_i.tmv(contact_pt - cars.pos.expand(1))
    with_bumper = local_on_i.x > C.BUMP_MIN_FORWARD_DIST

    bump = contact_ij & ~either_demoed & ~in_cooldown & towards & gaining \
        & with_bumper

    demo_mode = int(mut.demo_mode)
    if demo_mode == 1:
        is_demo = bump
    elif demo_mode == 2:
        is_demo = jnp.zeros_like(bump)
    else:
        is_demo = bump & cars.is_supersonic[:, None]
    if not mut.enable_team_demos:
        is_demo = is_demo & (teams[:, None, None] != teams[None, :, None])

    ground_hit = cars.is_on_ground[None, :]               # victim j
    base_scale = jnp.where(
        ground_hit, C.BUMP_VEL_AMOUNT_GROUND_CURVE(speed_towards),
        C.BUMP_VEL_AMOUNT_AIR_CURVE(speed_towards))
    up_j = cars.rot.u.expand(0)
    hit_up_dir = vwhere(ground_hit, up_j, V3.of(0.0, 0.0, 1.0))
    bump_impulse = vel_dir_i * base_scale + hit_up_dir * (
        C.BUMP_UPWARD_VEL_AMOUNT_CURVE(speed_towards)
        * mut.bump_force_scale)
    plain_bump = bump & ~is_demo
    victim_impulse = vwhere(plain_bump, bump_impulse, zero).sum(axis=0)

    any_bump = jnp.any(bump, axis=1)
    # highest-index bumped victim per bumper: static select chain over the
    # (small) player axis — equals argmax(where(bump, j, -1)) incl. the
    # no-bump→0 case, and is Mosaic-legal (int argmax is not)
    victim_idx = jnp.zeros(bump.shape[:1] + bump.shape[2:], jnp.int32)
    for j in range(P):
        victim_idx = jnp.where(bump[:, j], jnp.int32(j), victim_idx)
    bumper_other = jnp.where(any_bump, victim_idx,
                             cars.car_contact_other_idx)
    bumper_cooldown = jnp.where(any_bump, mut.bump_cooldown_time,
                                cars.car_contact_cooldown_timer)
    return {
        "dvel": dvel, "dang": dang, "dpos": dpos, "bump": bump,
        "demo": is_demo,
        "victim_impulse": victim_impulse,
        "bumper_other": bumper_other, "bumper_cooldown": bumper_cooldown,
    }
