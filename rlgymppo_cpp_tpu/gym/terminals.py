"""Terminal conditions, batched + functional.

Interface: carry = cond.init(batch_shape); done, carry = cond.check(gs, carry)
with done of shape [N]. Mirrors RLGymSim_CPP
src/RLGymSim_CPP/Utils/TerminalConditions/*.
"""

import jax.numpy as jnp

from rlgymppo_cpp_tpu.sim import constants as C
from rlgymppo_cpp_tpu.gym.gamestate import GameState


class TerminalCondition:
    def init(self, batch_shape):
        return ()

    def check(self, gs: GameState, carry):
        raise NotImplementedError

    def reset_carry(self, carry, reset_mask):
        """Zero per-env state where `reset_mask` (auto-reset on done)."""
        return carry


class NoTouchCondition(TerminalCondition):
    """Terminal after `max_steps` consecutive steps with no ball touch
    (NoTouchCondition.h:18-28)."""

    def __init__(self, max_steps):
        self.max_steps = max_steps

    def init(self, batch_shape):
        return jnp.zeros(batch_shape, jnp.int32)

    def check(self, gs, carry):
        touched = jnp.any(gs.ball_touched_step, axis=-1)
        steps = jnp.where(touched, 0, carry + 1)
        return steps >= self.max_steps, steps

    def reset_carry(self, carry, reset_mask):
        return jnp.where(reset_mask, 0, carry)


class GoalScoreCondition(TerminalCondition):
    """Terminal when the ball is in a goal (GoalScoreCondition.h:9-12,
    RLGSC::Math::IsBallScored)."""

    def check(self, gs, carry):
        scored = jnp.abs(gs.ball_pos[..., 1]) > (
            C.SOCCAR_GOAL_SCORE_BASE_THRESHOLD_Y
            + C.BALL_COLLISION_RADIUS_SOCCAR)
        return scored, carry


class TimeoutCondition(TerminalCondition):
    """Terminal after a fixed number of steps (rlgym-style timeout)."""

    def __init__(self, max_steps):
        self.max_steps = max_steps

    def init(self, batch_shape):
        return jnp.zeros(batch_shape, jnp.int32)

    def check(self, gs, carry):
        steps = carry + 1
        return steps >= self.max_steps, steps

    def reset_carry(self, carry, reset_mask):
        return jnp.where(reset_mask, 0, carry)
