from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.mutators import MutatorConfig
from rlgymppo_cpp_tpu.sim.car_config import (
    CarConfig, CAR_CONFIG_OCTANE, CAR_CONFIG_DOMINUS, CAR_CONFIG_PLANK,
    CAR_CONFIG_BREAKOUT, CAR_CONFIG_HYBRID, CAR_CONFIG_MERC,
)
from rlgymppo_cpp_tpu.sim.state import (
    CarControls, CarState, BallState, PadState, ArenaState,
)
from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.arena_config import ArenaConfig
from rlgymppo_cpp_tpu.sim.ball_pred import BallPredTracker
from rlgymppo_cpp_tpu.sim.game_event_tracker import (
    GameEventTracker, GameEventTrackerConfig,
)
from rlgymppo_cpp_tpu.sim.serialize import clone_state, save_state, load_state
