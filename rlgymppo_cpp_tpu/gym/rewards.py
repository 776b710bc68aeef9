"""Reward function library, batched and functional.

Same semantics as RLGymSim_CPP's reward classes (src/RLGymSim_CPP/Utils/
RewardFunctions/*), re-shaped for jit: a reward function is an object with

    carry = fn.init(gs)                       # persistent cross-step state
    rewards, carry = fn.compute(gs, prev_actions, final, carry)

where `rewards` is [N, P]. Stateless rewards carry (). `teams` is a static
length-P array bound at construction via `bind_teams` (called by Match).
"""

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.maths.vec import dot, norm, normalized
from rlgymppo_cpp_tpu.gym import common_values as CV
from rlgymppo_cpp_tpu.gym.gamestate import GameState


class RewardFunction:
    teams = None

    def bind_teams(self, teams):
        self.teams = np.asarray(teams)

    def init(self, gs: GameState):
        return ()

    def compute(self, gs: GameState, prev_actions, final, carry):
        raise NotImplementedError


class CombinedReward(RewardFunction):
    """Weighted sum of child rewards (CombinedReward.h:36-46)."""

    def __init__(self, funcs_with_weights):
        self.children = [f for f, _ in funcs_with_weights]
        self.weights = [w for _, w in funcs_with_weights]

    def bind_teams(self, teams):
        super().bind_teams(teams)
        for c in self.children:
            c.bind_teams(teams)

    def init(self, gs):
        return tuple(c.init(gs) for c in self.children)

    def compute(self, gs, prev_actions, final, carry):
        total = 0.0
        new_carry = []
        for child, w, c in zip(self.children, self.weights, carry):
            r, c2 = child.compute(gs, prev_actions, final, c)
            total = total + r * w
            new_carry.append(c2)
        return total, tuple(new_carry)


class ZeroSumReward(RewardFunction):
    """r_i*(1-spirit) + avgTeam*spirit - avgOpp*oppScale
    (ZeroSumReward.cpp:3-30)."""

    def __init__(self, child, team_spirit, opponent_scale=1.0):
        self.child = child
        self.team_spirit = team_spirit
        self.opponent_scale = opponent_scale

    def bind_teams(self, teams):
        super().bind_teams(teams)
        self.child.bind_teams(teams)

    def init(self, gs):
        return self.child.init(gs)

    def compute(self, gs, prev_actions, final, carry):
        rewards, carry = self.child.compute(gs, prev_actions, final, carry)
        teams = self.teams
        avg = []
        for t in (0, 1):
            mask = jnp.asarray(teams == t, jnp.float32)
            cnt = max(int((teams == t).sum()), 1)
            avg.append(jnp.sum(rewards * mask, axis=-1, keepdims=True) / cnt)
        own_avg = jnp.where(jnp.asarray(teams == 0), avg[0], avg[1])
        opp_avg = jnp.where(jnp.asarray(teams == 0), avg[1], avg[0])
        out = rewards * (1 - self.team_spirit) + own_avg * self.team_spirit \
            - opp_avg * self.opponent_scale
        return out, carry


class EventReward(RewardFunction):
    """Weighted positive deltas of 11 tracked values
    (CommonRewards.{h,cpp}). Weight order: goal, team_goal, concede, assist,
    touch, shot, shot_pass, save, demo, demoed, boost_pickup."""

    def __init__(self, goal=0.0, team_goal=0.0, concede=0.0, assist=0.0,
                 touch=0.0, shot=0.0, shot_pass=0.0, save=0.0, demo=0.0,
                 demoed=0.0, boost_pickup=0.0):
        self.weights = jnp.asarray(
            [goal, team_goal, concede, assist, touch, shot, shot_pass, save,
             demo, demoed, boost_pickup], jnp.float32)

    def _extract(self, gs: GameState):
        teams = jnp.asarray(self.teams)
        team_goals = jnp.take_along_axis(
            gs.score_line, jnp.broadcast_to(
                teams, (*gs.score_line.shape[:-1], len(self.teams))), axis=-1)
        opp_goals = jnp.take_along_axis(
            gs.score_line, jnp.broadcast_to(
                1 - teams, (*gs.score_line.shape[:-1], len(self.teams))),
            axis=-1)
        # NOTE: the boostPickup channel tracks the positive delta of
        # boostFRACTION, not a pickup counter — PlayerData::boostPickups is
        # never incremented by the reference (CommonRewards.cpp:17 reads
        # player.boostFraction into the val set).
        vals = [
            gs.match_goals, team_goals, opp_goals, gs.match_assists,
            gs.ball_touched_step, gs.match_shots, gs.match_shot_passes,
            gs.match_saves, gs.match_demos, gs.is_demoed, gs.boost_fraction,
        ]
        return jnp.stack([v.astype(jnp.float32) for v in vals], axis=-1)

    def init(self, gs):
        return self._extract(gs)

    def compute(self, gs, prev_actions, final, carry):
        new_vals = self._extract(gs)
        reward = jnp.sum(
            jnp.maximum(new_vals - carry, 0.0) * self.weights, axis=-1)
        return reward, new_vals


class VelocityReward(RewardFunction):
    def __init__(self, is_negative=False):
        self.sign = -1.0 if is_negative else 1.0

    def compute(self, gs, prev_actions, final, carry):
        return norm(gs.car_vel) / CV.CAR_MAX_SPEED * self.sign, carry


class SaveBoostReward(RewardFunction):
    def __init__(self, exponent=0.5):
        self.exponent = exponent

    def compute(self, gs, prev_actions, final, carry):
        return jnp.clip(gs.boost_fraction ** self.exponent, 0.0, 1.0), carry


class VelocityBallToGoalReward(RewardFunction):
    def __init__(self, own_goal=False):
        self.own_goal = own_goal

    def compute(self, gs, prev_actions, final, carry):
        target_orange = (jnp.asarray(self.teams) == 0) != self.own_goal
        target = jnp.where(
            target_orange[:, None],
            jnp.asarray(CV.ORANGE_GOAL_BACK), jnp.asarray(CV.BLUE_GOAL_BACK))
        dir_to_goal = normalized(target - gs.ball_pos[..., None, :])
        return dot(dir_to_goal,
                   gs.ball_vel[..., None, :] / CV.BALL_MAX_SPEED), carry


class VelocityPlayerToBallReward(RewardFunction):
    def compute(self, gs, prev_actions, final, carry):
        dir_to_ball = normalized(gs.ball_pos[..., None, :] - gs.car_pos)
        return dot(dir_to_ball, gs.car_vel / CV.CAR_MAX_SPEED), carry


class FaceBallReward(RewardFunction):
    def compute(self, gs, prev_actions, final, carry):
        dir_to_ball = normalized(gs.ball_pos[..., None, :] - gs.car_pos)
        return dot(gs.car_rot[..., :, 0], dir_to_ball), carry


class TouchBallReward(RewardFunction):
    def __init__(self, aerial_weight=0.0):
        self.aerial_weight = aerial_weight

    def compute(self, gs, prev_actions, final, carry):
        height_factor = ((gs.ball_pos[..., 2] + CV.BALL_RADIUS)
                         / (CV.BALL_RADIUS * 2)) ** self.aerial_weight
        return jnp.where(gs.ball_touched_step,
                         height_factor[..., None], 0.0), carry
