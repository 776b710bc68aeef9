from rlgymppo_cpp_tpu.learn.config import (
    LearnerConfig, PPOLearnerConfig, SkillTrackerConfig,
)
from rlgymppo_cpp_tpu.learn.experience_buffer import ExperienceBuffer
from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
from rlgymppo_cpp_tpu.learn.learner import Learner
from rlgymppo_cpp_tpu.learn.rollout import (
    RolloutCollector, MultiGymCollector,
)
from rlgymppo_cpp_tpu.learn.infer_unit import InferUnit
from rlgymppo_cpp_tpu.learn.skill_tracker import SkillTracker
from rlgymppo_cpp_tpu.learn.train_step import make_train_step
