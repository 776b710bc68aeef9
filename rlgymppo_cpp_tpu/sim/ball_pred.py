"""Ball trajectory prediction.

Equivalent of RocketSim's BallPredTracker (src/Sim/BallPredTracker/*): the
reference keeps a ball-only clone arena and re-simulates N ticks ahead,
reusing the still-valid prefix — and it works in every game mode
(BallPredTracker.cpp:25-71, the clone arena carries the mode). Here the
ball-only tick is the ball slice of the real arena tick running on the
SAME core-ball physics (sim/core_ball.py) the arena uses — soccar sphere,
heatseeker homing, and the snowday 20-gon puck manifold included — so the
whole prediction is one jitted lax.scan producing all N future ball states
at once, for a single arena or a whole batch.
"""

import functools

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.v3 import mwhere, vwhere
from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.sim import core_ball, core_rb
from rlgymppo_cpp_tpu.sim import state as S
from rlgymppo_cpp_tpu.sim.core_state import (
    BALL_SCHEMA, struct_from_core, struct_to_core,
)


class BallPredTracker:
    def __init__(self, arena, num_pred_ticks: int = 120):
        self.arena = arena
        self.num_pred_ticks = num_pred_ticks

    def _core_ball_tick(self, ball, gravity):
        """One tick of ball-only physics on the core layout: the exact
        ball slice of Arena.tick (gravity/drag, world contact + mode
        collision response, integration incl. the puck's rotation,
        clamps)."""
        arena = self.arena
        dt = arena.tick_time
        mut = arena.mut
        mode = arena.game_mode
        sleeping = (ball.vel.norm_sq() == 0.0) & (ball.ang_vel.norm_sq()
                                                  == 0.0)

        ball = core_ball.ball_pre_tick(ball, mode, dt)
        vel = vwhere(sleeping, ball.vel, ball.vel + gravity * dt)
        damping = (1.0 - mut.ball_drag) ** dt
        ball = ball.replace(vel=vwhere(sleeping, vel, vel * damping))

        dvel, dang, dpos, hit, normal = core_ball.ball_world_contact(
            ball, arena.geom, mut, dt, sleeping, mode)
        ball, cache = core_ball.ball_on_world_collision(
            ball, normal, hit, mode, dt)
        ball = ball.replace(vel=ball.vel + dvel,
                            ang_vel=ball.ang_vel + dang)
        ball = ball.replace(pos=vwhere(sleeping, ball.pos,
                                       ball.pos + ball.vel * dt + dpos))
        if mode == C.GameMode.SNOWDAY:
            new_rot = core_rb.integrate_rotation(ball.rot, ball.ang_vel, dt)
            ball = ball.replace(rot=mwhere(sleeping, ball.rot, new_rot))
        return core_ball.ball_finish_tick(ball, cache, mut)

    @functools.partial(jax.jit, static_argnames=("self",))
    def get_pred(self, ball: S.BallState):
        """Predict num_pred_ticks ahead.

        ball: BallState with any batch shape. Returns a BallState pytree
        with a leading [T] time axis (ForceUpdateAllPred equivalent,
        BallPredTracker.cpp:63-71).
        """
        batch_shape = ball.pos.shape[:-1]
        bn = len(batch_shape)
        core = struct_to_core(ball, BALL_SCHEMA, bn)
        gravity = self.arena.gravity_v3      # scalar V3, broadcasts

        def body(b, _):
            b = self._core_ball_tick(b, gravity)
            return b, b

        _, pred = jax.lax.scan(body, core, None, length=self.num_pred_ticks)
        # leading scan axis [T] sits outside the core layout: convert each
        # time slice back to the public struct under vmap
        return jax.vmap(lambda c: struct_from_core(
            S.BallState, c, BALL_SCHEMA, batch_shape))(pred)

    def get_ball_state_for_time(self, pred, time_ahead: float):
        """Nearest predicted state for a time delta in seconds
        (BallPredTracker::GetBallStateForTime)."""
        idx = int(round(time_ahead / self.arena.tick_time))
        idx = max(0, min(idx, self.num_pred_ticks - 1))
        return jax.tree.map(lambda x: x[idx], pred)
