"""Discrete action parser: the Necto-style 90-action lookup table.

Built with the same generation loops and ordering as the reference
(RLGymSim_CPP src/RLGymSim_CPP/Utils/ActionParsers/DiscreteAction.cpp:3-68):
24 ground actions then 66 aerial actions. Parsing an index batch is a single
gather into the constant table.

Action layout (BasicTypes/Action.h): [throttle, steer, pitch, yaw, roll,
jump, boost, handbrake].
"""

import numpy as np
import jax.numpy as jnp

from rlgymppo_cpp_tpu.sim.state import CarControls


def _build_table():
    actions = []
    r_b = (0.0, 1.0)
    r_f = (-1.0, 0.0, 1.0)

    # Ground
    for throttle in r_f:
        for steer in r_f:
            for boost in r_b:
                for handbrake in r_b:
                    if boost == 1 and throttle != 1:
                        continue
                    actions.append(
                        [throttle, steer, 0, steer, 0, 0, boost, handbrake])

    # Aerial
    for pitch in r_f:
        for yaw in r_f:
            for roll in r_f:
                for jump in r_b:
                    for boost in r_b:
                        if jump == 1 and yaw != 0:
                            continue  # only need roll for sideflip
                        if pitch == roll == jump == 0:
                            continue  # duplicate with ground
                        handbrake = float(
                            jump == 1 and (pitch != 0 or yaw != 0 or roll != 0))
                        actions.append(
                            [boost, yaw, pitch, yaw, roll, jump, boost,
                             handbrake])
    return np.array(actions, dtype=np.float32)


class DiscreteAction:
    """Lookup-table action parser (90 actions by default)."""

    def __init__(self):
        self.table = jnp.asarray(_build_table())

    @property
    def action_amount(self) -> int:
        return int(self.table.shape[0])

    def parse(self, action_indices, demoed=None) -> CarControls:
        """[..., P] int indices -> CarControls. Demoed players get zero
        controls (Match::ParseActions, Match.cpp:44-52)."""
        a = self.table[action_indices]           # [..., P, 8]
        if demoed is not None:
            a = jnp.where(demoed[..., None], 0.0, a)
        return CarControls(
            throttle=a[..., 0], steer=a[..., 1], pitch=a[..., 2],
            yaw=a[..., 3], roll=a[..., 4],
            jump=a[..., 5] == 1, boost=a[..., 6] == 1,
            handbrake=a[..., 7] == 1,
        )

    def to_action_vec(self, action_indices):
        """[..., P] -> [..., P, 8] float action rows (for prev-action obs)."""
        return self.table[action_indices]
