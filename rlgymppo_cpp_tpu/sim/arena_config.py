"""ArenaConfig analog (RocketSim src/Sim/Arena/ArenaConfig/ArenaConfig.h).

Most of the reference's knobs govern bullet memory layout and have no
TPU meaning (memory weight modes trade KB per arena; here state is dense
arrays either way, ~2 KB logical per 2-car arena). The behavioral options
are kept: custom boost pad tables and the no-ball-rotation optimization
(always on in the reference's default and here — ArenaConfig.h:33).
"""

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass
class ArenaConfig:
    # HEAVY/LIGHT memory modes are meaningless for array state; accepted
    # for API parity (ArenaConfig.h:12-16)
    memory_weight_mode: str = "HEAVY"

    # Replace the standard pad table (ArenaConfig.h:42-46): positions
    # [K, 3] and a matching is_big mask
    custom_boost_pads: Optional[Sequence] = None
    custom_boost_pads_is_big: Optional[Sequence] = None

    # Ball rotation integration is skipped (ArenaConfig.h:30-33 default)
    no_ball_rot: bool = True
