"""Vectorized shot / goal / save / assist event detection.

Functional re-design of RocketSim's GameEventTracker
(src/Sim/GameEventTracker/GameEventTracker.{h,cpp}) and
Arena::IsBallProbablyGoingIn (src/Sim/Arena/Arena.cpp:827-947): the
reference walks cars with callbacks once per gym step; here one pure
`update` advances the tracker state for a whole batch of arenas and returns
per-player event increments (the counters the reference's Gym wires into
PlayerData via IncPlayerCounter, src/RLGymSim_CPP/Gym.cpp:5-56).

Event semantics preserved exactly (GameEventTracker.cpp:48-158):
- goal: ball newly scored; scorer = last same-team toucher within
  goalMaxTouchTime, assist = previous same-team toucher within
  passMaxTouchTime of the scorer's touch;
- shot: ball not shot, cooldown elapsed, speed >= shotMinSpeed, predicted
  to score within shotMinScoreTime; shooter's touch must be at least
  shotTouchMinDelay old;
- save: ball was shot, prediction flips to not-scoring, and a defender
  touched it since the last update.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim.constants import GameMode

# RLBot wiki goal dims, used by the reference's own prediction
# (Arena.cpp:846-849)
APPROX_GOAL_HALF_WIDTH = 892.755
APPROX_GOAL_HEIGHT = 642.775
HOOPS_APPROX_RIM_HEIGHT = 365.0


@dataclasses.dataclass
class GameEventTrackerConfig:
    """GameEventTracker.h:10-40 (defaults identical)."""
    shot_min_speed: float = 1750.0
    shot_touch_min_delay: float = 0.3
    pred_score_extra_margin: float = 0.0
    shot_event_cooldown: float = 1.0
    shot_min_score_time: float = 2.0
    goal_max_touch_time: float = 4.0
    pass_max_touch_time: float = 2.0


@struct.dataclass
class EventTrackerState:
    """Persistent cross-step info (GameEventTracker.h:79-83)."""
    shot_cooldown: jnp.ndarray      # [N] float
    ball_shot: jnp.ndarray          # [N] bool
    shot_goal_team: jnp.ndarray     # [N] int32 (team whose net is targeted)
    ball_scored_last: jnp.ndarray   # [N] bool

    @staticmethod
    def zeros(batch_shape):
        return EventTrackerState(
            shot_cooldown=jnp.zeros(batch_shape, jnp.float32),
            ball_shot=jnp.zeros(batch_shape, bool),
            shot_goal_team=jnp.zeros(batch_shape, jnp.int32),
            ball_scored_last=jnp.zeros(batch_shape, bool),
        )


def _hoops_goal_xy_margin_sq(x, y):
    """BallWithinHoopsGoalXYMarginSq: negative inside the hoop footprint."""
    dy = jnp.abs(y) * 0.9 - 2770.0
    return x * x + dy * dy - 716.0 ** 2


def ball_probably_going_in(ball_pos, ball_vel, mut, game_mode,
                           max_time, extra_margin):
    """Arena::IsBallProbablyGoingIn (Arena.cpp:827-947), batched.

    Returns (going_in [..] bool, goal_team [..] int32 — the team whose net
    the ball is heading into: 0 = blue net (y<0), 1 = orange net (y>0)).
    """
    eps = 1.1920929e-07
    if game_mode in (GameMode.SOCCAR, GameMode.SNOWDAY, GameMode.HEATSEEKER):
        vy = ball_vel[..., 1]
        moving = jnp.abs(vy) >= eps
        score_dir = jnp.sign(vy)
        goal_y = mut.goal_base_threshold_y * score_dir
        dist = jnp.abs(ball_pos[..., 1] - goal_y)
        t = dist / jnp.maximum(jnp.abs(vy), eps)
        in_time = t <= max_time
        gravity = jnp.asarray(mut.gravity, jnp.float32)
        extrap = ball_pos + ball_vel * t[..., None] \
            + gravity * (t * t)[..., None] * 0.5
        margin = mut.ball_radius * 0.1 + extra_margin
        ok = moving & in_time \
            & (extrap[..., 2] <= APPROX_GOAL_HEIGHT + margin) \
            & (jnp.abs(extrap[..., 0]) <= APPROX_GOAL_HALF_WIDTH + margin)
        goal_team = jnp.where(score_dir > 0, 1, 0).astype(jnp.int32)
        return ok, goal_team

    if game_mode == GameMode.HOOPS:
        min_height = HOOPS_APPROX_RIM_HEIGHT + mut.ball_radius * 1.2
        margin = mut.ball_radius
        margin_sq = margin * margin

        already_in = (ball_vel[..., 2] < -eps) \
            & (ball_pos[..., 2] < min_height) \
            & (_hoops_goal_xy_margin_sq(ball_pos[..., 0],
                                        ball_pos[..., 1]) < 0)

        g = float(np.asarray(mut.gravity)[2])
        v = ball_vel[..., 2]
        h = ball_pos[..., 2] - min_height
        sqrt_in = v * v - 2 * g * h
        has_intercept = sqrt_in > 0
        sqrt_out = jnp.sqrt(jnp.maximum(sqrt_in, 0.0))
        up_t = (-v + sqrt_out) / g
        down_t = (-v - sqrt_out) / g

        # Never reaches rim height: scoring iff it started inside the hoop
        stays_in = _hoops_goal_xy_margin_sq(
            ball_pos[..., 0], ball_pos[..., 1]) < -margin_sq

        # Rising arc must clear the rim
        extrap_up = ball_pos + ball_vel * up_t[..., None]
        up_margin_sq = _hoops_goal_xy_margin_sq(extrap_up[..., 0],
                                                extrap_up[..., 1])
        min_clearance = 60.0 + mut.ball_radius
        hits_rim = (up_t >= 0) & (up_margin_sq > -margin_sq) \
            & (up_margin_sq < min_clearance ** 2)

        extrap_down = ball_pos + ball_vel * down_t[..., None]
        down_y = jnp.abs(extrap_down[..., 1])
        wall_bounce_y = C.ARENA_EXTENT_Y_HOOPS - mut.ball_radius
        over = jnp.maximum(down_y - wall_bounce_y, 0.0)
        down_y = down_y - over * (1.0 + mut.ball_world_restitution)
        lands_in = _hoops_goal_xy_margin_sq(
            extrap_down[..., 0], down_y) < -margin_sq

        going_in = jnp.where(
            has_intercept, ~hits_rim & lands_in, stays_in) | already_in
        # down_y has its sign stripped; the original y decides the net
        goal_team = jnp.where(extrap_down[..., 1] > 0, 1, 0).astype(jnp.int32)
        goal_team = jnp.where(already_in,
                              jnp.where(ball_pos[..., 1] > 0, 1, 0),
                              goal_team)
        return going_in & (g < -eps), goal_team

    batch = ball_pos.shape[:-1]
    return jnp.zeros(batch, bool), jnp.zeros(batch, jnp.int32)


class GameEventTracker:
    """Per-batch event tracking for one Arena configuration."""

    def __init__(self, arena, config: GameEventTrackerConfig = None):
        self.config = config or GameEventTrackerConfig()
        self.arena = arena
        self.teams = jnp.asarray(arena.teams)          # [P]
        self.tick_rate = 1.0 / arena.tick_time

    def init(self, batch_shape):
        return EventTrackerState.zeros(batch_shape)

    def reset_carry(self, state: EventTrackerState, reset_mask):
        """ResetPersistentInfo for envs in `reset_mask`
        (GameEventTracker.cpp:160-166; goal team intentionally kept)."""
        return state.replace(
            shot_cooldown=jnp.where(reset_mask, 0.0, state.shot_cooldown),
            ball_shot=jnp.where(reset_mask, False, state.ball_shot),
            ball_scored_last=jnp.where(reset_mask, False,
                                       state.ball_scored_last),
        )

    # ------------------------------------------------------------------ core

    def _shooter_passer(self, team, hit_valid, hit_tick, tick_count,
                        max_shooter_ticks, max_passer_ticks,
                        find_passer=True):
        """GetShooterPasser (GameEventTracker.cpp:5-46), batched.

        team: [..] int32 per env. Returns (has_shooter, shooter_idx,
        has_passer, passer_idx); latest touch wins, first slot on ties.
        """
        P = hit_valid.shape[-1]
        team_mask = self.teams == team[..., None]            # [.., P]
        smask = team_mask & hit_valid \
            & (hit_tick + max_shooter_ticks[..., None]
               >= tick_count[..., None])
        big_neg = jnp.int32(-1 << 30)
        stick = jnp.where(smask, hit_tick, big_neg)
        shooter = jnp.argmax(stick, axis=-1)
        has_shooter = jnp.any(smask, axis=-1)
        shoot_tick = jnp.take_along_axis(
            hit_tick, shooter[..., None], axis=-1)[..., 0]

        if not find_passer:
            z = jnp.zeros_like(shooter)
            return has_shooter, shooter, jnp.zeros_like(has_shooter), z

        not_shooter = jnp.arange(P) != shooter[..., None]
        pmask = team_mask & hit_valid & not_shooter \
            & (hit_tick + max_passer_ticks >= shoot_tick[..., None])
        ptick = jnp.where(pmask, hit_tick, big_neg)
        passer = jnp.argmax(ptick, axis=-1)
        has_passer = has_shooter & jnp.any(pmask, axis=-1)
        return has_shooter, shooter, has_passer, passer

    def update(self, state: EventTrackerState, arena_state, scored,
               delta_ticks: int):
        """One tracker update (GameEventTracker::Update, .cpp:48-158).

        arena_state: post-snapshot ArenaState; scored: [..] bool;
        delta_ticks: ticks advanced since the previous update (= tickSkip).

        Returns (state', events) with events a dict of per-player [.., P]
        int32 increments: goals, assists, shots, shot_passes, saves.
        """
        cfg = self.config
        mut = self.arena.mut
        mode = self.arena.game_mode
        ball = arena_state.ball
        bhi = arena_state.cars.ball_hit_info
        tick_count = arena_state.tick_count
        P = self.arena.num_players
        delta_time = delta_ticks * self.arena.tick_time

        hit_valid = bhi.is_valid
        hit_tick = bhi.tick_count_when_hit

        def one_hot(idx, fire):
            return (jax.nn.one_hot(idx, P, dtype=jnp.int32)
                    * fire[..., None].astype(jnp.int32))

        # ---- goal event (scored & !scoredLast) ----
        goal_now = scored & ~state.ball_scored_last
        scoring_team = jnp.where(ball.pos[..., 1] > 0, 0, 1).astype(jnp.int32)
        g_max = jnp.full(tick_count.shape,
                         int(cfg.goal_max_touch_time * self.tick_rate),
                         jnp.int32)
        p_max = jnp.int32(int(cfg.pass_max_touch_time * self.tick_rate))
        has_sc, scorer, has_as, assister = self._shooter_passer(
            scoring_team, hit_valid, hit_tick, tick_count, g_max, p_max)
        goals = one_hot(scorer, goal_now & has_sc)
        assists = one_hot(assister, goal_now & has_as)

        # ---- shot event (not scored, not currently shot) ----
        not_scored = ~scored
        cooldown_active = state.shot_cooldown > 0
        going_in, pred_team = ball_probably_going_in(
            ball.pos, ball.vel, mut, mode,
            cfg.shot_min_score_time, cfg.pred_score_extra_margin)
        speed_ok = jnp.sum(ball.vel * ball.vel, axis=-1) \
            >= cfg.shot_min_speed ** 2
        delay_ticks = int(cfg.shot_touch_min_delay * self.tick_rate)
        shooter_team = 1 - pred_team
        s_max = jnp.full(tick_count.shape, delta_ticks + delay_ticks,
                         jnp.int32)
        has_sh, shooter, has_pa, passer = self._shooter_passer(
            shooter_team, hit_valid, hit_tick, tick_count, s_max, p_max)
        ticks_since_hit = tick_count - jnp.take_along_axis(
            hit_tick, shooter[..., None], axis=-1)[..., 0]
        shot_fire = not_scored & ~state.ball_shot & ~cooldown_active \
            & speed_ok & going_in & has_sh & (ticks_since_hit >= delay_ticks)
        shots = one_hot(shooter, shot_fire)
        shot_passes = one_hot(passer, shot_fire & has_pa)

        # ---- save event (not scored, currently shot, no longer going in) --
        shot_over = not_scored & state.ball_shot & ~going_in
        d_max = jnp.full(tick_count.shape, delta_ticks, jnp.int32)
        has_sv, saver, _, _ = self._shooter_passer(
            state.shot_goal_team, hit_valid, hit_tick, tick_count, d_max,
            jnp.int32(0), find_passer=False)
        saves = one_hot(saver, shot_over & has_sv)

        # ---- state advance ----
        new_cooldown = jnp.where(
            not_scored & ~state.ball_shot & cooldown_active,
            jnp.maximum(state.shot_cooldown - delta_time, 0.0),
            state.shot_cooldown)
        new_cooldown = jnp.where(shot_fire, cfg.shot_event_cooldown,
                                 new_cooldown)
        new_ball_shot = jnp.where(
            not_scored, (state.ball_shot & going_in) | shot_fire,
            state.ball_shot)
        new_goal_team = jnp.where(shot_fire, pred_team,
                                  state.shot_goal_team)

        events = {"goals": goals, "assists": assists, "shots": shots,
                  "shot_passes": shot_passes, "saves": saves}
        new_state = EventTrackerState(
            shot_cooldown=new_cooldown,
            ball_shot=new_ball_shot,
            shot_goal_team=new_goal_team,
            ball_scored_last=scored,
        )
        return new_state, events
