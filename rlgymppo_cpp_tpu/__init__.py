"""rlgymppo_cpp_tpu — a TPU-native Rocket League PPO training framework.

A ground-up JAX/XLA re-design with the capabilities of ZealanL/RLGymPPO_CPP
(reference layout: examplemain -> RLGymPPO_CPP -> RLGymSim_CPP -> RocketSim).

Instead of the reference's thread-per-agent CPU architecture, every arena is a
row in structure-of-arrays device buffers; thousands of arenas step in lockstep
inside one jitted `lax.scan`, feeding an on-device PPO learner. Multi-chip
scaling is expressed with `jax.sharding` over a device mesh (see `parallel/`).
"""

__version__ = "0.1.0"

from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.mutators import MutatorConfig
from rlgymppo_cpp_tpu.sim.car_config import CarConfig, CAR_CONFIG_OCTANE
