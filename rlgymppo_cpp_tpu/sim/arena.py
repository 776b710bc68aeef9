"""Batched arena: the lockstep physics tick.

TPU-native replacement for Arena::Step (RocketSim src/Sim/Arena/
Arena.cpp:716-812) + bullet's stepSimulation: one pure function advances a
whole batch of arenas a tick, composing the car vehicle sim, contacts, boost
pads and ball logic in the reference's tick order:

  ball sleep check -> car _PreTickUpdate (vehicle+controls) -> pad pre-tick
  -> ball pre-tick -> gravity/forces+damping -> contacts (car-world,
  car-car, car-ball, ball-world) -> integrate -> car post/finish -> pad
  pickup -> ball finish.

An `Arena` object holds only static configuration (game mode, mutators, car
config, team table, geometry); all dynamic data lives in `ArenaState`.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import norm_sq
from rlgymppo_cpp_tpu.maths.rot import euler_to_rotmat
from rlgymppo_cpp_tpu.maths.v3 import V3, M3, vwhere, mwhere, from_core
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import rigidbody as rb
from rlgymppo_cpp_tpu.sim import boost_pads as bp
from rlgymppo_cpp_tpu.sim import core_rb
from rlgymppo_cpp_tpu.sim import core_ball
from rlgymppo_cpp_tpu.sim import core_car
from rlgymppo_cpp_tpu.sim import core_collisions as core_col
from rlgymppo_cpp_tpu.sim import core_pads
from rlgymppo_cpp_tpu.sim.arena_geom import make_geom
from rlgymppo_cpp_tpu.sim.car_config import (
    CarConfig, CAR_CONFIG_OCTANE, bullet_effective_half_extents,
)
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.core_state import (
    arena_state_to_core, arena_state_from_core, controls_to_core,
)
from rlgymppo_cpp_tpu.sim.mutators import MutatorConfig
from rlgymppo_cpp_tpu.sim.state import (
    ArenaState, BallState, CarState, PadState, WheelsState, CarControls,
)


def _expand(mask, ref):
    return jnp.reshape(mask, mask.shape + (1,) * (ref.ndim - mask.ndim))


class Arena:
    """Static configuration + pure step functions for a batch of arenas.

    `teams` is a length-P int array (0=blue, 1=orange); the reference's
    Gym ctor adds cars interleaved B,O,B,O,... (Gym.cpp:45-49).
    """

    def __init__(self, game_mode: GameMode = GameMode.SOCCAR,
                 teams=(0, 1),
                 car_config: CarConfig = CAR_CONFIG_OCTANE,
                 mutator_config: MutatorConfig = None,
                 tick_rate: float = 120.0,
                 arena_config=None,
                 geom=None):
        assert 15 <= tick_rate <= 120
        self.game_mode = game_mode
        self.teams = np.asarray(teams, dtype=np.int32)
        self.num_players = len(self.teams)
        self.car_config = car_config
        self.arena_config = arena_config
        self.mut = mutator_config or MutatorConfig.for_game_mode(game_mode)
        self.tick_time = 1.0 / tick_rate
        # geom override supports mesh-backed worlds (MeshGeom) in place of
        # the analytic plane soup
        self.geom = geom if geom is not None else make_geom(game_mode)

        custom_pads = getattr(arena_config, "custom_boost_pads", None)
        if custom_pads is not None:
            self.pad_pos = jnp.asarray(custom_pads, jnp.float32)
            is_big = getattr(arena_config, "custom_boost_pads_is_big", None)
            if is_big is None:
                is_big = np.zeros(len(custom_pads), bool)
            self.pad_is_big = jnp.asarray(is_big, bool)
        elif game_mode == GameMode.THE_VOID:
            self.pad_pos = jnp.zeros((0, 3), jnp.float32)
            self.pad_is_big = jnp.zeros((0,), bool)
        else:
            self.pad_pos, self.pad_is_big = bp.pad_table(game_mode)
        self.num_pads = int(self.pad_pos.shape[0])

        # Contact box: configured hitbox + bullet's convex margin. bullet's
        # manifold forms ~1 uu outside the effective (implicit+margin) box
        # and the solver's gap/dt allowance lets partial impulses fire up to
        # ~3 uu outside the CONFIGURED surface at game speeds (measured with
        # tools/golden/probe_contact.cpp), so `configured/2 + BOX_MARGIN` is
        # the best sharp-box stand-in for the softened discrete contact.
        half = np.asarray(car_config.hitbox_size, np.float32) / 2 \
            + core_col.BOX_MARGIN
        self.hitbox_half = jnp.asarray(half)
        self.hitbox_offset = jnp.asarray(car_config.hitbox_pos_offset,
                                         jnp.float32)
        # Inertia: bullet computes calculateLocalInertia from the EFFECTIVE
        # box (implicit + shrunk margin), ~0.13 uu smaller per extent than
        # configured for Octane — a naive configured-size box is ~9% off on
        # inverse inertia (verified vs getInvInertiaDiagLocal in
        # tools/golden/probe_powerslide.cpp), which showed up as
        # powerslide/drive_steer side-impulse drift.
        inertia_half = bullet_effective_half_extents(car_config.hitbox_size)
        self.inv_inertia_diag = rb.box_inv_inertia_local(
            self.mut.car_mass, inertia_half)

        wcfg = car_config.wheel_arrays()
        self.wheels_cfg = {
            "connection": jnp.asarray(wcfg["connection"]),
            "radius": jnp.asarray(wcfg["radius"]),
            "rest_len": jnp.asarray(wcfg["rest_len"]),
            "force_scale": jnp.asarray(wcfg["force_scale"]),
            "inv_inertia": self.inv_inertia_diag,
            "mass": self.mut.car_mass,
            "dodge_deadzone": car_config.dodge_deadzone,
            "dt": self.tick_time,
        }
        self.gravity = jnp.asarray(self.mut.gravity, jnp.float32)

        # ---- env-last core static config (see maths/v3.py) ----
        self.core_wheel_cfg = core_car.make_core_wheel_cfg(self.wheels_cfg)
        self.hitbox_half_t = tuple(float(h) for h in np.asarray(half))
        self.hitbox_offset_t = tuple(
            float(o) for o in np.asarray(car_config.hitbox_pos_offset))
        self.ii_diag = self.core_wheel_cfg["ii_diag"]
        if self.num_pads:
            self.core_pad_cfg = core_pads.make_core_pad_cfg(
                self.pad_pos, self.pad_is_big)
        else:
            self.core_pad_cfg = None
        g = np.asarray(self.mut.gravity, np.float32)
        self.gravity_v3 = V3.of(g[0], g[1], g[2])
        tbl = np.asarray(
            C.CAR_RESPAWN_LOCATIONS_HOOPS if game_mode == GameMode.HOOPS
            else C.CAR_RESPAWN_LOCATIONS_SOCCAR, np.float32)
        self.respawn_tbl_x = jnp.asarray(tbl[:, 0])
        self.respawn_tbl_y = jnp.asarray(tbl[:, 1])
        self.respawn_tbl_yaw = jnp.asarray(tbl[:, 2])

    # ------------------------------------------------------------------ state

    def default_state(self, batch_shape=()) -> ArenaState:
        """Fresh arenas: ball at rest, cars parked on their team's respawn
        line (Arena::AddCar calls Respawn; Car.cpp:43-56 — we use the slot
        index instead of a random location for determinism)."""
        rest_z = C.BALL_REST_Z if self.game_mode != GameMode.SNOWDAY \
            else self.mut.ball_radius
        state = ArenaState.zeros(batch_shape, self.num_players, self.num_pads,
                                 ball_rest_z=rest_z)
        tbl = C.CAR_RESPAWN_LOCATIONS_HOOPS if self.game_mode == GameMode.HOOPS \
            else C.CAR_RESPAWN_LOCATIONS_SOCCAR
        loc = np.stack([tbl[p % len(tbl)] for p in range(self.num_players)])
        sign = np.where(self.teams == 0, 1.0, -1.0)
        pos = np.stack([loc[:, 0], loc[:, 1] * sign,
                        np.full(self.num_players, C.CAR_RESPAWN_Z)], axis=-1)
        yaw = loc[:, 2] + np.where(self.teams == 0, 0.0, np.pi)
        pos = jnp.broadcast_to(jnp.asarray(pos, jnp.float32),
                               (*batch_shape, self.num_players, 3))
        yaw = jnp.broadcast_to(jnp.asarray(yaw, jnp.float32),
                               (*batch_shape, self.num_players))
        rot = euler_to_rotmat(yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw))
        return state.replace(cars=state.cars.replace(pos=pos, rot=rot))

    # ---------------------------------------------------------------- kickoff

    def reset_to_random_kickoff(self, state: ArenaState, key) -> ArenaState:
        """Arena::ResetToRandomKickoff (Arena.cpp:112-216), batched.

        Supports up to 5 cars per team (the reference overflows extras onto
        respawn points; raise if needed).
        """
        batch = state.batch_shape
        P = self.num_players
        teams = jnp.asarray(self.teams)

        if self.game_mode == GameMode.HEATSEEKER:
            spawns = jnp.asarray(C.CAR_SPAWN_LOCATIONS_HEATSEEKER)
            n_locs = C.CAR_SPAWN_LOCATION_AMOUNT_HEATSEEKER
        elif self.game_mode == GameMode.HOOPS:
            spawns = jnp.asarray(C.CAR_SPAWN_LOCATIONS_HOOPS)
            n_locs = C.CAR_SPAWN_LOCATION_AMOUNT
        else:
            spawns = jnp.asarray(C.CAR_SPAWN_LOCATIONS_SOCCAR)
            n_locs = C.CAR_SPAWN_LOCATION_AMOUNT

        # Per-team rank of each player slot (static)
        rank = np.zeros(P, dtype=np.int32)
        counts = {0: 0, 1: 0}
        for p, t in enumerate(self.teams):
            rank[p] = counts[int(t)]
            counts[int(t)] += 1
        if max(counts.values()) > n_locs:
            raise NotImplementedError("more than 5 cars per team")
        rank = jnp.asarray(rank)

        key, sub, kball = jax.random.split(key, 3)
        # One shuffled kickoff order per env, shared by both teams
        perm = jax.random.permutation(
            sub, jnp.broadcast_to(jnp.arange(n_locs), (*batch, n_locs)),
            axis=-1, independent=True)
        spawn_idx = jnp.take_along_axis(
            perm, jnp.broadcast_to(rank, (*batch, P)) % n_locs, axis=-1)
        spawn = spawns[spawn_idx]                       # [.., P, 3] (x, y, yaw)

        team_sign = jnp.where(teams == 0, 1.0, -1.0)    # [P]
        pos = jnp.stack([
            spawn[..., 0] * team_sign,
            spawn[..., 1] * team_sign,
            jnp.full_like(spawn[..., 0], C.CAR_SPAWN_REST_Z)], axis=-1)
        yaw = spawn[..., 2] + jnp.where(teams == 0, 0.0, jnp.pi)
        rot = euler_to_rotmat(yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw))

        cars = CarState.zeros((*batch, P))
        cars = cars.replace(pos=pos, rot=rot)

        ball = BallState.zeros(batch)
        if self.game_mode == GameMode.HEATSEEKER:
            side = jnp.where(
                jax.random.bernoulli(kball, shape=batch), 1.0, -1.0)
            bpos = jnp.asarray(C.Heatseeker.BALL_START_POS) \
                * jnp.stack([jnp.ones_like(side), side, jnp.ones_like(side)],
                            axis=-1)
            bvel = jnp.asarray(C.Heatseeker.BALL_START_VEL) \
                * jnp.stack([jnp.ones_like(side), side, jnp.ones_like(side)],
                            axis=-1)
            ball = ball.replace(pos=bpos, vel=bvel)
        elif self.game_mode == GameMode.SNOWDAY:
            ball = ball.replace(
                vel=ball.vel.at[..., 2].set(1.1920929e-07))
        elif self.game_mode == GameMode.HOOPS:
            ball = ball.replace(
                vel=ball.vel.at[..., 2].set(C.BALL_HOOPS_Z_VEL))

        return ArenaState(
            ball=ball, cars=cars,
            wheels=WheelsState.zeros((*batch, P)),
            pads=PadState.zeros(batch, self.num_pads),
            tick_count=jnp.zeros(batch, jnp.int32),
        )

    # ------------------------------------------------------------------- tick

    def _tick_respawn_idx(self, key, N):
        """Random respawn-location index per (player, env) for one tick —
        the ONLY randomness the tick consumes. Hoisted out of
        _tick_core_inner so the fused Pallas tick kernel (ops/
        pallas_tick.py) can take it as a plain input; key semantics match
        the original in-tick split exactly."""
        _, krespawn = jax.random.split(key)
        return jax.random.randint(
            krespawn, (self.num_players, N), 0,
            C.CAR_RESPAWN_LOCATION_AMOUNT)

    def _tick_core(self, core, controls, key):
        N = core.cars.boost.shape[-1]
        return self._tick_core_inner(core, controls,
                                     self._tick_respawn_idx(key, N))

    def _tick_core_inner(self, core, controls, ridx):
        """One 1/120s tick on the env-last core layout; `ridx` [P, N]
        int32 is this tick's pre-drawn respawn table index. Returns
        (core', events) with per-player event arrays shaped [P, N].
        Pure elementwise/select math — no RNG, no gathers — so it runs
        unchanged inside the fused Pallas tick kernel."""
        dt = self.tick_time
        mut = self.mut
        geom = self.geom
        P = self.num_players
        teams = jnp.asarray(self.teams)
        cars, ball, pads, wheels = core.cars, core.ball, core.pads, \
            core.wheels
        N = cars.boost.shape[-1]
        zero3 = V3.of(0.0, 0.0, 0.0)

        # Ball zero-velocity sleeping (Arena.cpp:721-727)
        sleeping = (ball.vel.norm_sq() == 0.0) & (ball.ang_vel.norm_sq() == 0.0)

        # Respawn placement for cars whose demo timer expires this tick
        L = C.CAR_RESPAWN_LOCATION_AMOUNT
        team_sign = jnp.where(teams == 0, 1.0, -1.0)[:, None]
        # select-chain over the tiny static spawn table (no gathers)
        tbl = np.asarray(
            C.CAR_RESPAWN_LOCATIONS_HOOPS
            if self.game_mode == GameMode.HOOPS
            else C.CAR_RESPAWN_LOCATIONS_SOCCAR, np.float32)
        rx = jnp.zeros((P, N))
        ry0 = jnp.zeros((P, N))
        ryaw0 = jnp.zeros((P, N))
        for li in range(L):
            m = ridx == li
            rx = jnp.where(m, float(tbl[li, 0]), rx)
            ry0 = jnp.where(m, float(tbl[li, 1]), ry0)
            ryaw0 = jnp.where(m, float(tbl[li, 2]), ryaw0)
        rpos = V3(rx, ry0 * team_sign, jnp.full((P, N), C.CAR_RESPAWN_Z))
        ryaw = ryaw0 + jnp.where(teams == 0, 0.0, jnp.pi)[:, None]
        cy, sy = jnp.cos(ryaw), jnp.sin(ryaw)
        z = jnp.zeros_like(ryaw)
        rrot = M3(V3(cy, sy, z), V3(-sy, cy, z),
                  V3(z, z, jnp.ones_like(ryaw)))

        # --- car pre-tick: vehicle sim + control state machine ---
        # (A single shared per-car grid ctx for all suspension + corner
        # queries was tried for grid-backed geoms — it broke the
        # mesh_*_drive goldens by ~10 uu: wheels near the ramp-floor seam
        # read the EXTRAPOLATED field of the car-center cell, and seam
        # cells are exactly where trilinear extrapolation is wrong. The
        # gather-cost fix lives in the tables instead: int16 rows halve
        # the per-gather tile fetch with 0.06 uu quantization.)
        geom_ctx = None
        cars, wheels, car_accel, active = core_car.car_pre_tick(
            cars, wheels, controls, geom, self.core_wheel_cfg, mut, dt,
            (rpos, rrot), geom_ctx)

        # --- pad + ball pre-tick ---
        if self.num_pads:
            pads = core_pads.pads_pre_tick(pads, dt)
        ball = core_ball.ball_pre_tick(ball, self.game_mode, dt)

        # --- gravity + accumulated forces + damping ---
        cars = cars.replace(vel=cars.vel + vwhere(
            active, (self.gravity_v3 + car_accel) * dt, zero3))
        ball_vel = vwhere(sleeping, ball.vel,
                          ball.vel + self.gravity_v3 * dt)
        damping = (1.0 - mut.ball_drag) ** dt
        ball = ball.replace(vel=vwhere(sleeping, ball_vel,
                                       ball_vel * damping))

        # --- contacts ---
        cw_dvel, cw_dang, cw_dpos, cw_hit, cw_normal = \
            core_col.car_world_contacts(
                cars, geom, mut, self.ii_diag, self.hitbox_half_t,
                self.hitbox_offset_t, dt, active, geom_ctx)

        cc = core_col.car_car_contacts(
            cars, mut, self.ii_diag, self.hitbox_half_t,
            self.hitbox_offset_t, dt, active, teams)

        cb_car_dvel, cb_car_dang, cb_ball_dvel, cb_ball_dang, \
            cb_ball_dpos, ball_cache, ball_hit, new_bhi = \
            core_col.car_ball_contacts(
                cars, ball, mut, self.game_mode, self.ii_diag,
                self.hitbox_half_t, self.hitbox_offset_t, dt, active,
                core.tick_count)

        bw_dvel, bw_dang, bw_dpos, bw_hit, bw_normal = \
            core_ball.ball_world_contact(
                ball, geom, mut, dt, sleeping, self.game_mode)
        ball, bw_cache = core_ball.ball_on_world_collision(
            ball, bw_normal, bw_hit, self.game_mode, dt)

        # Heatseeker Ball::_OnHit (Ball.cpp:203-215)
        if self.game_mode == GameMode.HEATSEEKER:
            hs = ball.hs_info
            any_hit = jnp.any(ball_hit, axis=0)
            # last-hitting player's team as a static select chain over P
            # (== argmax-of-index + teams gather, but Pallas-legal)
            hit_team = jnp.zeros(ball_hit.shape[1:], jnp.int32)
            for p in range(P):
                hit_team = jnp.where(ball_hit[p], int(self.teams[p]),
                                     hit_team)
            new_dir = jnp.where(hit_team == 0, 1.0, -1.0)
            can_increase = (hs.time_since_hit
                            > C.Heatseeker.MIN_SPEEDUP_INTERVAL) \
                | (hs.y_target_dir == 0)
            speed_up = any_hit & can_increase & (new_dir != hs.y_target_dir)
            ball = ball.replace(hs_info=hs.replace(
                y_target_dir=jnp.where(any_hit, new_dir, hs.y_target_dir),
                time_since_hit=jnp.where(speed_up, 0.0, hs.time_since_hit),
                cur_target_speed=jnp.where(
                    speed_up,
                    jnp.minimum(hs.cur_target_speed
                                + C.Heatseeker.TARGET_SPEED_INCREMENT,
                                C.Heatseeker.MAX_SPEED),
                    hs.cur_target_speed)))

        # Apply contact responses
        cars = cars.replace(
            vel=cars.vel + cw_dvel + cc["dvel"] + cb_car_dvel,
            ang_vel=cars.ang_vel + cw_dang + cc["dang"] + cb_car_dang,
            has_world_contact=cars.has_world_contact | cw_hit,
            world_contact_normal=vwhere(cw_hit, cw_normal,
                                        cars.world_contact_normal),
            car_contact_other_idx=cc["bumper_other"],
            car_contact_cooldown_timer=cc["bumper_cooldown"],
            ball_hit_info=new_bhi,
        )
        ball = ball.replace(
            vel=ball.vel + cb_ball_dvel + bw_dvel,
            ang_vel=ball.ang_vel + cb_ball_dang + bw_dang)

        # Demos (Arena.cpp:390-391): victim j demoed if anyone demoed it
        demoed_now = jnp.any(cc["demo"], axis=0) & ~cars.is_demoed
        cars = cars.replace(
            is_demoed=cars.is_demoed | demoed_now,
            demo_respawn_timer=jnp.where(
                demoed_now, mut.respawn_delay, cars.demo_respawn_timer))

        # --- integrate positions ---
        new_rot = core_rb.integrate_rotation(cars.rot, cars.ang_vel, dt)
        cars = cars.replace(
            pos=cars.pos + vwhere(
                active, cars.vel * dt + cw_dpos + cc["dpos"], zero3),
            rot=mwhere(active, new_rot, cars.rot))
        ball = ball.replace(
            pos=vwhere(sleeping, ball.pos,
                       ball.pos + ball.vel * dt + cb_ball_dpos + bw_dpos))
        if self.game_mode == GameMode.SNOWDAY:
            # The puck is the one ball shape whose orientation matters
            # (m_noRot only applies to spheres, Ball.cpp:107): integrate
            # its rotation so the cylinder contact sees the real axis.
            new_ball_rot = core_rb.integrate_rotation(
                ball.rot, ball.ang_vel, dt)
            ball = ball.replace(rot=mwhere(sleeping, ball.rot,
                                           new_ball_rot))
        # else: ball rotation skipped (noBallRot optimization, Ball.cpp:107)

        # --- post tick ---
        post_active = active & ~cars.is_demoed
        post = core_car.car_post_tick(cars, controls, dt)
        post = jax.tree.map(
            lambda new, old: jnp.where(post_active, new, old), post, cars)
        cars = core_car.car_finish_tick(post, cc["victim_impulse"],
                                        post_active)

        pickups = jnp.zeros(cars.boost.shape, jnp.int32)
        if self.num_pads:
            pads = core_pads.pads_check_collide(
                pads, cars, post_active, self.core_pad_cfg,
                self.hitbox_half, self.hitbox_offset)
            pads, new_boost, pickups = core_pads.pads_post_tick(
                pads, cars.boost, mut, self.core_pad_cfg)
            cars = cars.replace(boost=new_boost)

        ball = core_ball.ball_finish_tick(ball, ball_cache + bw_cache, mut)

        events = {
            # bumps vs opponents only (Gym.cpp _BumpCallback skips same-team)
            "bump": jnp.sum(
                (cc["bump"] & (teams[:, None, None] != teams[None, :, None])
                 ).astype(jnp.int32), axis=1),
            "demo": jnp.sum(cc["demo"].astype(jnp.int32), axis=1),
            "demoed": demoed_now,
            "pickup": pickups,
        }
        core = core.replace(ball=ball, cars=cars, wheels=wheels, pads=pads,
                            tick_count=core.tick_count + 1)
        return core, events

    def tick(self, state: ArenaState, controls: CarControls, key):
        """One 1/120s physics tick. Returns (state', events) in the public
        [batch, P] layout (events: bump/demo counts, demoed, pickup)."""
        state2, ev = self.step(state, controls, key, 1)
        return state2, ev

    def step(self, state: ArenaState, controls: CarControls, key,
             num_ticks: int):
        """Arena::Step(n): n ticks under the same controls, accumulating
        events. The state converts to the env-last core layout once, all
        ticks run there, and converts back — conversion cost is the logical
        state size, negligible vs the tick math."""
        batch_shape = state.batch_shape
        bn = len(batch_shape)
        core = arena_state_to_core(state)
        cctrl = controls_to_core(controls, bn)

        if num_ticks == 1:
            core, events_acc = self._tick_core(core, cctrl, key)
        else:
            # lax.scan over ticks: one tick body in the compiled program
            # instead of num_ticks copies (compile time matters; runtime
            # difference is negligible)
            keys = jax.random.split(key, num_ticks)

            def body(carry, k):
                c, acc = carry
                c, ev = self._tick_core(c, cctrl, k)
                acc = {
                    kk: (acc[kk] | ev[kk]) if ev[kk].dtype == jnp.bool_
                    else acc[kk] + ev[kk]
                    for kk in ev
                }
                return (c, acc), None

            P = self.num_players
            N = core.tick_count.shape[-1]
            zero_events = {
                "bump": jnp.zeros((P, N), jnp.int32),
                "demo": jnp.zeros((P, N), jnp.int32),
                "demoed": jnp.zeros((P, N), bool),
                "pickup": jnp.zeros((P, N), jnp.int32),
            }
            (core, events_acc), _ = jax.lax.scan(
                body, (core, zero_events), keys)

        state = arena_state_from_core(core, batch_shape)
        events = {k: from_core(v, batch_shape)
                  for k, v in events_acc.items()}
        return state, events

    @functools.cached_property
    def tick_jit(self):
        """Cached jitted single tick: (state, controls, key) -> (state, ev)."""
        return jax.jit(self.tick)

    def step_jit(self, num_ticks: int):
        """Cached jitted n-tick step."""
        if not hasattr(self, "_step_jits"):
            self._step_jits = {}
        if num_ticks not in self._step_jits:
            self._step_jits[num_ticks] = jax.jit(
                functools.partial(self.step, num_ticks=num_ticks))
        return self._step_jits[num_ticks]

    # ------------------------------------------------------------------ goals

    def is_ball_scored(self, ball_pos):
        """Arena::IsBallScored (Arena.cpp:949-975)."""
        if self.game_mode in (GameMode.SOCCAR, GameMode.HEATSEEKER,
                              GameMode.SNOWDAY):
            return jnp.abs(ball_pos[..., 1]) > (
                self.mut.goal_base_threshold_y + self.mut.ball_radius)
        if self.game_mode == GameMode.HOOPS:
            below = ball_pos[..., 2] < C.HOOPS_GOAL_SCORE_THRESHOLD_Z
            dy = jnp.abs(ball_pos[..., 1]) * 0.9 - 2770.0
            dist_sq = ball_pos[..., 0] ** 2 + dy ** 2
            return below & (dist_sq < 716.0 ** 2)
        return jnp.zeros(ball_pos.shape[:-1], bool)
