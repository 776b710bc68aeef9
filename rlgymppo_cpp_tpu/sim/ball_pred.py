"""Ball trajectory prediction.

Equivalent of RocketSim's BallPredTracker (src/Sim/BallPredTracker/*): the
reference keeps a ball-only clone arena and re-simulates N ticks ahead,
reusing the still-valid prefix. Here the ball-only tick is a pure function,
so the whole prediction is one jitted lax.scan producing all N future ball
states at once — for a single arena or a whole batch.
"""

import functools

import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import norm_sq
from rlgymppo_cpp_tpu.sim.ball import (
    ball_pre_tick, ball_world_contact, ball_on_world_collision,
    ball_finish_tick,
)


class BallPredTracker:
    def __init__(self, arena, num_pred_ticks: int = 120):
        self.arena = arena
        self.num_pred_ticks = num_pred_ticks

    def ball_only_tick(self, ball):
        """One tick of ball-only physics: the ball slice of Arena.tick
        (gravity/drag, world contacts, integration, clamps)."""
        arena = self.arena
        dt = arena.tick_time
        mut = arena.mut
        sleeping = (norm_sq(ball.vel) == 0.0) & (norm_sq(ball.ang_vel) == 0.0)

        ball = ball_pre_tick(ball, arena.game_mode, dt)
        vel = jnp.where(sleeping[..., None], ball.vel,
                        ball.vel + arena.gravity * dt)
        damping = (1.0 - mut.ball_drag) ** dt
        ball = ball.replace(vel=jnp.where(sleeping[..., None], vel,
                                          vel * damping))

        dvel, dang, hit, normal = ball_world_contact(
            ball, arena.geom, mut, dt, sleeping)
        ball, cache = ball_on_world_collision(ball, normal, hit,
                                              arena.game_mode, dt)
        ball = ball.replace(vel=ball.vel + dvel, ang_vel=ball.ang_vel + dang)
        ball = ball.replace(pos=jnp.where(sleeping[..., None], ball.pos,
                                          ball.pos + ball.vel * dt))
        return ball_finish_tick(ball, cache, mut)

    @functools.partial(jax.jit, static_argnames=("self",))
    def get_pred(self, ball):
        """Predict num_pred_ticks ahead.

        ball: BallState with any batch shape. Returns a BallState pytree
        with a leading [T] time axis (ForceUpdateAllPred equivalent,
        BallPredTracker.cpp:63-71).
        """
        def body(b, _):
            b = self.ball_only_tick(b)
            return b, b

        _, pred = jax.lax.scan(body, ball, None,
                               length=self.num_pred_ticks)
        return pred

    def get_ball_state_for_time(self, pred, time_ahead: float):
        """Nearest predicted state for a time delta in seconds
        (BallPredTracker::GetBallStateForTime)."""
        idx = int(round(time_ahead / self.arena.tick_time))
        idx = max(0, min(idx, self.num_pred_ticks - 1))
        return jax.tree.map(lambda x: x[idx], pred)
