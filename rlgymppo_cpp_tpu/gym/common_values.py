"""Gym-side constants (RLGymSim_CPP src/RLGymSim_CPP/Utils/CommonValues.h)."""

import numpy as np

SIDE_WALL_X = 4096.0
BACK_WALL_Y = 5120.0
CEILING_Z = 2044.0
BACK_NET_Y = 6000.0

GOAL_HEIGHT = 642.775
GRAVITY_Z = -650.0
BOOST_CONSUMED_PER_SECOND = 100.0 / 3.0

ORANGE_GOAL_CENTER = np.array([0.0, BACK_WALL_Y, GOAL_HEIGHT / 2], np.float32)
BLUE_GOAL_CENTER = np.array([0.0, -BACK_WALL_Y, GOAL_HEIGHT / 2], np.float32)
ORANGE_GOAL_BACK = np.array([0.0, BACK_NET_Y, GOAL_HEIGHT / 2], np.float32)
BLUE_GOAL_BACK = np.array([0.0, -BACK_NET_Y, GOAL_HEIGHT / 2], np.float32)

BALL_RADIUS = 92.75  # the gym-side convention value, not the sim radius
BALL_MAX_SPEED = 6000.0
CAR_MAX_SPEED = 2300.0
SUPERSONIC_THRESHOLD = 2200.0
CAR_MAX_ANG_VEL = 5.5

BLUE_TEAM = 0
ORANGE_TEAM = 1
NUM_ACTIONS = 8

BOOST_LOCATIONS_AMOUNT = 34
# Canonical obs ordering of the 34 pads (CommonValues.h:40-75). Note entry 27
# is (-940, 3310) in the reference (a known 2uu quirk vs the sim table).
BOOST_LOCATIONS = np.array([
    [0.0, -4240.0, 70.0],
    [-1792.0, -4184.0, 70.0],
    [1792.0, -4184.0, 70.0],
    [-3072.0, -4096.0, 73.0],
    [3072.0, -4096.0, 73.0],
    [-940.0, -3308.0, 70.0],
    [940.0, -3308.0, 70.0],
    [0.0, -2816.0, 70.0],
    [-3584.0, -2484.0, 70.0],
    [3584.0, -2484.0, 70.0],
    [-1788.0, -2300.0, 70.0],
    [1788.0, -2300.0, 70.0],
    [-2048.0, -1036.0, 70.0],
    [0.0, -1024.0, 70.0],
    [2048.0, -1036.0, 70.0],
    [-3584.0, 0.0, 73.0],
    [-1024.0, 0.0, 70.0],
    [1024.0, 0.0, 70.0],
    [3584.0, 0.0, 73.0],
    [-2048.0, 1036.0, 70.0],
    [0.0, 1024.0, 70.0],
    [2048.0, 1036.0, 70.0],
    [-1788.0, 2300.0, 70.0],
    [1788.0, 2300.0, 70.0],
    [-3584.0, 2484.0, 70.0],
    [3584.0, 2484.0, 70.0],
    [0.0, 2816.0, 70.0],
    [-940.0, 3310.0, 70.0],
    [940.0, 3308.0, 70.0],
    [-3072.0, 4096.0, 73.0],
    [3072.0, 4096.0, 73.0],
    [-1792.0, 4184.0, 70.0],
    [1792.0, 4184.0, 70.0],
    [0.0, 4240.0, 70.0],
], dtype=np.float32)


def boost_pad_index_map(pad_pos):
    """Map canonical obs pad order -> arena pad order by 2D position
    (_BuildBoostPadIndexMap, GameState.cpp:7-50).

    The canonical table is the 34 soccar locations (rlgym's
    common_values, mirrored by CommonValues.h:40-75) — the reference gym
    layer fatals on any other pad table. Here non-soccar tables (hoops'
    20 pads, custom ArenaConfig pads) fall back to arena order, padded
    with -1 slots that read as permanently inactive, so the obs keeps its
    fixed 34-wide pad block."""
    pad_pos = np.asarray(pad_pos)
    n = pad_pos.shape[0]
    mapping = np.zeros(BOOST_LOCATIONS_AMOUNT, dtype=np.int32)
    canonical = n == BOOST_LOCATIONS_AMOUNT
    if canonical:
        for i, target in enumerate(BOOST_LOCATIONS):
            d2 = np.sum((pad_pos[:, :2] - target[:2]) ** 2, axis=-1)
            j = int(np.argmin(d2))
            if d2[j] >= 10.0:
                canonical = False
                break
            mapping[i] = j
        if canonical and len(set(mapping.tolist())) != \
                BOOST_LOCATIONS_AMOUNT:
            raise ValueError("duplicate boost pad match")
    if not canonical:
        mapping = np.full(max(BOOST_LOCATIONS_AMOUNT, n), -1, np.int32)
        mapping[:n] = np.arange(n)
    return mapping
