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
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import rigidbody as rb
from rlgymppo_cpp_tpu.sim import collisions as col
from rlgymppo_cpp_tpu.sim import boost_pads as bp
from rlgymppo_cpp_tpu.sim.arena_geom import make_geom
from rlgymppo_cpp_tpu.sim.ball import (
    ball_pre_tick, ball_world_contact, ball_on_world_collision,
    ball_finish_tick,
)
from rlgymppo_cpp_tpu.sim.car import (
    car_pre_tick, car_post_tick, car_finish_tick,
)
from rlgymppo_cpp_tpu.sim.car_config import CarConfig, CAR_CONFIG_OCTANE
from rlgymppo_cpp_tpu.sim.constants import GameMode
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
                 tick_rate: float = 120.0):
        assert 15 <= tick_rate <= 120
        self.game_mode = game_mode
        self.teams = np.asarray(teams, dtype=np.int32)
        self.num_players = len(self.teams)
        self.car_config = car_config
        self.mut = mutator_config or MutatorConfig.for_game_mode(game_mode)
        self.tick_time = 1.0 / tick_rate
        self.geom = make_geom(game_mode)

        if game_mode == GameMode.THE_VOID:
            self.pad_pos = jnp.zeros((0, 3), jnp.float32)
            self.pad_is_big = jnp.zeros((0,), bool)
        else:
            self.pad_pos, self.pad_is_big = bp.pad_table(game_mode)
        self.num_pads = int(self.pad_pos.shape[0])

        half = np.asarray(car_config.hitbox_size, np.float32) / 2 \
            + col.BOX_MARGIN
        self.hitbox_half = jnp.asarray(half)
        self.hitbox_offset = jnp.asarray(car_config.hitbox_pos_offset,
                                         jnp.float32)
        self.inv_inertia_diag = rb.box_inv_inertia_local(self.mut.car_mass, half)

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

    def tick(self, state: ArenaState, controls: CarControls, key):
        """One 1/120s physics tick. Returns (state', events).

        events: bump [.., P] count, demo [.., P] count, demoed [.., P],
        pickup [.., P] count — accumulated by `step` over a tick-skip.
        """
        dt = self.tick_time
        mut = self.mut
        geom = self.geom
        teams = jnp.asarray(self.teams)
        cars, ball, pads, wheels = state.cars, state.ball, state.pads, \
            state.wheels

        # Ball zero-velocity sleeping (Arena.cpp:721-727)
        sleeping = (norm_sq(ball.vel) == 0.0) & (norm_sq(ball.ang_vel) == 0.0)

        # Respawn placement for any cars whose demo timer expires this tick
        key, krespawn = jax.random.split(key)
        respawn_tbl = jnp.asarray(
            C.CAR_RESPAWN_LOCATIONS_HOOPS if self.game_mode == GameMode.HOOPS
            else C.CAR_RESPAWN_LOCATIONS_SOCCAR)
        ridx = jax.random.randint(
            krespawn, cars.boost.shape, 0, C.CAR_RESPAWN_LOCATION_AMOUNT)
        rspawn = respawn_tbl[ridx]
        team_sign = jnp.where(teams == 0, 1.0, -1.0)
        rpos = jnp.stack([
            rspawn[..., 0],
            rspawn[..., 1] * team_sign,
            jnp.full_like(rspawn[..., 0], C.CAR_RESPAWN_Z)], axis=-1)
        ryaw = rspawn[..., 2] + jnp.where(teams == 0, 0.0, jnp.pi)
        rrot = euler_to_rotmat(ryaw, jnp.zeros_like(ryaw), jnp.zeros_like(ryaw))

        # --- car pre-tick: vehicle sim + control state machine ---
        cars, wheels, car_accel, active = car_pre_tick(
            cars, wheels, controls, geom, self.wheels_cfg, mut, dt,
            (rpos, rrot))

        # --- pad + ball pre-tick ---
        if self.num_pads:
            pads = bp.pads_pre_tick(pads, dt)
        ball = ball_pre_tick(ball, self.game_mode, dt)

        # --- gravity + accumulated forces + damping ---
        cars = cars.replace(vel=cars.vel + jnp.where(
            active[..., None], (self.gravity + car_accel) * dt, 0.0))
        ball_vel = jnp.where(sleeping[..., None], ball.vel,
                             ball.vel + self.gravity * dt)
        damping = (1.0 - mut.ball_drag) ** dt
        ball = ball.replace(vel=jnp.where(sleeping[..., None],
                                          ball_vel, ball_vel * damping))

        # --- contacts ---
        cw_dvel, cw_dang, cw_hit, cw_normal = col.car_world_contacts(
            cars, geom, mut, self.inv_inertia_diag, self.hitbox_half,
            self.hitbox_offset, dt, active)

        cc = col.car_car_contacts(
            cars, mut, self.inv_inertia_diag, self.hitbox_half,
            self.hitbox_offset, dt, active, teams)

        cb_car_dvel, cb_car_dang, cb_ball_dvel, cb_ball_dang, \
            ball_cache, ball_hit, new_bhi = col.car_ball_contacts(
                cars, ball, mut, self.game_mode, self.inv_inertia_diag,
                self.hitbox_half, self.hitbox_offset, dt, active,
                state.tick_count)

        bw_dvel, bw_dang, bw_hit, bw_normal = ball_world_contact(
            ball, geom, mut, dt, sleeping)
        ball, bw_cache = ball_on_world_collision(
            ball, bw_normal, bw_hit, self.game_mode, dt)

        # Heatseeker Ball::_OnHit (Ball.cpp:203-215): any car touch retargets
        if self.game_mode == GameMode.HEATSEEKER:
            hs = ball.hs_info
            any_hit = jnp.any(ball_hit, axis=-1)
            # last hitter wins, like callback order
            P = self.num_players
            hitter = jnp.argmax(
                jnp.where(ball_hit, jnp.arange(P), -1), axis=-1)
            new_dir = jnp.where(teams[hitter] == 0, 1.0, -1.0)
            can_increase = (hs.time_since_hit > C.Heatseeker.MIN_SPEEDUP_INTERVAL) \
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
            world_contact_normal=jnp.where(
                cw_hit[..., None], cw_normal, cars.world_contact_normal),
            car_contact_other_idx=cc["bumper_other"],
            car_contact_cooldown_timer=cc["bumper_cooldown"],
            ball_hit_info=new_bhi,
        )
        ball = ball.replace(
            vel=ball.vel + cb_ball_dvel + bw_dvel,
            ang_vel=ball.ang_vel + cb_ball_dang + bw_dang)

        # Demos (Arena.cpp:390-391): victim j demoed if anyone demoed it
        demoed_now = jnp.any(cc["demo"], axis=-2) & ~cars.is_demoed
        cars = cars.replace(
            is_demoed=cars.is_demoed | demoed_now,
            demo_respawn_timer=jnp.where(
                demoed_now, mut.respawn_delay, cars.demo_respawn_timer))

        # --- integrate positions ---
        cars = cars.replace(
            pos=cars.pos + jnp.where(active[..., None], cars.vel * dt, 0.0),
            rot=jnp.where(_expand(active, cars.rot),
                          rb.integrate_rotation(cars.rot, cars.ang_vel, dt),
                          cars.rot))
        ball = ball.replace(
            pos=jnp.where(sleeping[..., None], ball.pos,
                          ball.pos + ball.vel * dt))
        # ball rotation is skipped (noBallRot optimization, Ball.cpp:107,
        # ArenaConfig.h:33 defaults true)

        # --- post tick ---
        post_active = active & ~cars.is_demoed
        post = car_post_tick(cars, controls, dt)
        post = jax.tree.map(
            lambda new, old: jnp.where(_expand(post_active, new), new, old),
            post, cars)
        cars = car_finish_tick(post, cc["victim_impulse"], post_active)

        pickups = jnp.zeros(cars.boost.shape, jnp.int32)
        if self.num_pads:
            pads = bp.pads_check_collide(
                pads, cars, post_active, self.pad_pos, self.pad_is_big,
                self.hitbox_half, self.hitbox_offset)
            pads, new_boost, pickup_ev = bp.pads_post_tick(
                pads, cars.boost, mut, self.pad_is_big)
            cars = cars.replace(boost=new_boost)
            pickups = jnp.sum(pickup_ev, axis=-1).astype(jnp.int32)

        ball = ball_finish_tick(ball, ball_cache + bw_cache, mut)

        events = {
            # bumps vs opponents only (Gym.cpp _BumpCallback skips same-team)
            "bump": jnp.sum(
                (cc["bump"] & (teams[:, None] != teams[None, :])).astype(
                    jnp.int32), axis=-1),
            "demo": jnp.sum(cc["demo"].astype(jnp.int32), axis=-1),
            "demoed": demoed_now,
            "pickup": pickups,
        }
        state = ArenaState(ball=ball, cars=cars, wheels=wheels, pads=pads,
                           tick_count=state.tick_count + 1)
        return state, events

    def step(self, state: ArenaState, controls: CarControls, key,
             num_ticks: int):
        """Arena::Step(n): n ticks under the same controls, accumulating
        events. Unrolled statically (n is small, typically <= 8)."""
        events_acc = None
        for i in range(num_ticks):
            key, sub = jax.random.split(key)
            state, ev = self.tick(state, controls, sub)
            if events_acc is None:
                events_acc = ev
            else:
                events_acc = {
                    k: (events_acc[k] | ev[k]) if ev[k].dtype == jnp.bool_
                    else events_acc[k] + ev[k]
                    for k in ev
                }
        return state, events_acc

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
