from rlgymppo_cpp_tpu.deploy.rlbot_client import (
    RLBotParams, RLBotBot, packet_to_game_state, run_bot,
)
