"""rlbot-framework agent hosting a trained TPU-framework policy.

Analog of the reference's rlbot/CppPythonAgent.py — but where that file
proxies to a C++ bot-server socket, the policy here runs in-process:
BaseAgent.get_output -> RLBotBot.get_output (tick-skip repeat + 1-tick
inference offset, RLBotClient.cpp:105-146).

This file is only imported by the rlbot framework on a deployment machine
(see rlbot.cfg); the training container has no rlbot package.
"""

import os

from rlbot.agents.base_agent import (
    BaseAgent, SimpleControllerState, BOT_CONFIG_AGENT_HEADER,
)
from rlbot.parsing.custom_config import ConfigObject

from rlgymppo_cpp_tpu.deploy.rlbot_client import RLBotBot, RLBotParams
from rlgymppo_cpp_tpu.gym.obs import DefaultOBS
from rlgymppo_cpp_tpu.gym.actions import DiscreteAction


class TpuAgent(BaseAgent):
    def __init__(self, name, team, index):
        super().__init__(name, team, index)
        self.bot = None
        self.checkpoint_path = "checkpoints"
        self.tick_skip = 8
        self.deterministic = True

    def load_config(self, config_object_header):
        self.checkpoint_path = config_object_header.get(
            "checkpoint_path", self.checkpoint_path)
        self.tick_skip = int(config_object_header.get(
            "tick_skip", self.tick_skip))
        self.deterministic = bool(config_object_header.get(
            "deterministic", self.deterministic))

    @staticmethod
    def create_agent_configurations(config: ConfigObject):
        params = config.get_header(BOT_CONFIG_AGENT_HEADER)
        params.add_value("checkpoint_path", str, default="checkpoints")
        params.add_value("tick_skip", int, default=8)
        params.add_value("deterministic", bool, default=True)

    def initialize_agent(self):
        params = RLBotParams(
            obs_builder=DefaultOBS(),
            action_parser=DiscreteAction(),
            checkpoint_path=self.checkpoint_path,
            tick_skip=self.tick_skip,
            deterministic=self.deterministic,
        )
        self.bot = RLBotBot(self.name, self.team, self.index, params)

    def get_output(self, packet) -> SimpleControllerState:
        a = self.bot.get_output(packet)
        ctrl = SimpleControllerState()
        ctrl.throttle = float(a[0])
        ctrl.steer = float(a[1])
        ctrl.pitch = float(a[2])
        ctrl.yaw = float(a[3])
        ctrl.roll = float(a[4])
        ctrl.jump = bool(a[5] > 0.5)
        ctrl.boost = bool(a[6] > 0.5)
        ctrl.handbrake = bool(a[7] > 0.5)
        return ctrl
