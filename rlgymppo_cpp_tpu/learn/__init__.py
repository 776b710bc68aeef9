from rlgymppo_cpp_tpu.learn.config import (
    LearnerConfig, PPOLearnerConfig, SkillTrackerConfig,
)
from rlgymppo_cpp_tpu.learn.experience_buffer import ExperienceBuffer
from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
from rlgymppo_cpp_tpu.learn.learner import Learner
