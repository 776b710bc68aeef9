from rlgymppo_cpp_tpu.gym.actions import DiscreteAction
from rlgymppo_cpp_tpu.gym.obs import DefaultOBS, DefaultOBSPadded
from rlgymppo_cpp_tpu.gym.rewards import (
    RewardFunction, CombinedReward, ZeroSumReward, EventReward,
    VelocityReward, SaveBoostReward, VelocityBallToGoalReward,
    VelocityPlayerToBallReward, FaceBallReward, TouchBallReward,
)
from rlgymppo_cpp_tpu.gym.terminals import (
    NoTouchCondition, GoalScoreCondition, TimeoutCondition,
)
from rlgymppo_cpp_tpu.gym.state_setters import RandomState, KickoffState
from rlgymppo_cpp_tpu.gym.gym import Gym, Match
