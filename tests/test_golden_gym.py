"""Golden GYM-LAYER parity vs the compiled reference (VERDICT r2 missing #1).

tools/golden/gym_recorder.cpp drives the reference RLGymSim_CPP Gym
(compiled from /root/reference) through scripted episodes and records, per
step, the full GameState PLUS the reference's own outputs: DefaultOBS /
DefaultOBSPadded obs vectors, reward values, parsed actions and terminal
flags. These tests rebuild a batched GameState from each recorded row and
run the TPU build's obs/reward/action/terminal code on it, asserting
(near-)exact equality — pinning the policy-input and reward interfaces the
same way tests/test_golden_traces.py pins the physics.

Reference entry points pinned:
  DefaultOBS float layout/coefs   DefaultOBS.cpp:3-56
  DefaultOBSPadded slot semantics DefaultOBSPadded.cpp:3-72 (shuffled slots
                                  compared as multisets of 19-float blocks)
  CommonRewards values            CommonRewards.{h,cpp}
  ZeroSumReward                   ZeroSumReward.cpp:3-30
  DiscreteAction table            DiscreteAction.cpp:3-68
  Match::ParseActions demo-zero   Envs/Match.cpp:44-52
  NoTouch/GoalScore terminals     NoTouchCondition.h:18-28,
                                  GoalScoreCondition.h:9-12

Event coverage across the traces (counter deltas recorded from the real
GameEventTracker): goals, saves, shots, bumps, demos, ball touches and
boost-fraction pickups. Assists/shotPasses never fired in the scripted
episodes; their weights are pinned by the hand-computed unit test in
tests/test_multi_gym.py instead.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from rlgymppo_cpp_tpu.gym.gamestate import (GameState, invert_vec,
                                            invert_rot)
from rlgymppo_cpp_tpu.gym.obs import DefaultOBS, DefaultOBSPadded
from rlgymppo_cpp_tpu.gym.actions import DiscreteAction
from rlgymppo_cpp_tpu.gym import rewards as R

# golden replays / multihost / learner e2e are the
# acceptance bar but dominate wall time: slow-marked, run
# with `pytest tests/ --runslow` (README "Testing")
pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

TRACES = [
    "gym_1v1_stateless",
    "gym_1v1_event",
    "gym_2v2_padded_zerosum",
    "gym_3v3_padded",
]


def reward_tree_for(name):
    """The same reward tree the recorder built (gym_recorder.cpp main)."""
    if name == "gym_1v1_stateless":
        return R.CombinedReward([
            (R.VelocityPlayerToBallReward(), 1.0),
            (R.FaceBallReward(), 0.25),
            (R.VelocityBallToGoalReward(), 0.5),
            (R.VelocityBallToGoalReward(own_goal=True), 0.3),
            (R.SaveBoostReward(), 0.125),
            (R.VelocityReward(), 0.0625),
            (R.TouchBallReward(0.2), 2.0),
        ])
    if name == "gym_1v1_event":
        return R.EventReward(goal=1, team_goal=2, concede=-4, assist=8,
                             touch=16, shot=32, shot_pass=64, save=128,
                             demo=256, demoed=-512, boost_pickup=1024)
    if name == "gym_2v2_padded_zerosum":
        return R.ZeroSumReward(
            R.CombinedReward([
                (R.VelocityPlayerToBallReward(), 1.0),
                (R.FaceBallReward(), 0.5),
                (R.EventReward(touch=5, goal=10), 1.0),
            ]), 0.3, 0.7)
    if name == "gym_3v3_padded":
        return R.CombinedReward([(R.VelocityPlayerToBallReward(), 1.0)])
    raise KeyError(name)


class Trace:
    def __init__(self, name):
        d = np.load(os.path.join(GOLDEN, name + ".npz"))
        self.name = name
        self.teams = d["teams"]
        self.obs_size = int(d["obs_size"])
        self.max_players = int(d["max_players"])
        self.is_reset = d["is_reset"] > 0.5
        self.done = d["done"] > 0.5
        self.action_idx = d["action_idx"]
        self.parsed = d["parsed"]
        self.ball = d["ball"]
        self.ball_inv = d["ball_inv"]
        self.car = d["car_phys"]
        self.car_inv = d["car_phys_inv"]
        self.flags = d["flags"]
        self.counters = d["counters"]
        self.pads = d["pads"]
        self.pads_inv = d["pads_inv"]
        self.pad_timers = d["pad_timers"]
        self.pad_timers_inv = d["pad_timers_inv"]
        self.score_line = d["score_line"]
        self.obs = d["obs"]
        self.rewards = d["rewards"]
        self.P = self.car.shape[1]
        self.R = self.car.shape[0]

    def game_state(self, rows=slice(None)):
        """Batched GameState over the selected rows (batch axis = row)."""
        car = self.car[rows]
        f = self.flags[rows]
        c = self.counters[rows]
        rot = np.stack([car[..., 3:6], car[..., 6:9], car[..., 9:12]],
                       axis=-1)  # columns: forward, right, up
        return GameState(
            ball_pos=jnp.asarray(self.ball[rows, 0:3]),
            ball_vel=jnp.asarray(self.ball[rows, 3:6]),
            ball_ang_vel=jnp.asarray(self.ball[rows, 6:9]),
            car_pos=jnp.asarray(car[..., 0:3]),
            car_rot=jnp.asarray(rot),
            car_vel=jnp.asarray(car[..., 12:15]),
            car_ang_vel=jnp.asarray(car[..., 15:18]),
            boost_fraction=jnp.asarray(f[..., 0]),
            is_on_ground=jnp.asarray(f[..., 1] > 0.5),
            has_flip=jnp.asarray(f[..., 2] > 0.5),
            has_jump=jnp.asarray(f[..., 3] > 0.5),
            is_demoed=jnp.asarray(f[..., 4] > 0.5),
            ball_touched_step=jnp.asarray(f[..., 5] > 0.5),
            ball_touched_tick=jnp.asarray(f[..., 6] > 0.5),
            match_goals=jnp.asarray(c[..., 0]),
            match_saves=jnp.asarray(c[..., 1]),
            match_assists=jnp.asarray(c[..., 2]),
            match_shots=jnp.asarray(c[..., 3]),
            match_shot_passes=jnp.asarray(c[..., 4]),
            match_bumps=jnp.asarray(c[..., 5]),
            match_demos=jnp.asarray(c[..., 6]),
            boost_pickups=jnp.asarray(c[..., 7]),
            pads_active=jnp.asarray(self.pads[rows] > 0.5),
            pad_timers=jnp.asarray(self.pad_timers[rows]),
            score_line=jnp.asarray(self.score_line[rows]),
            last_touch_idx=jnp.full(car.shape[0], -1, jnp.int32),
        )


@pytest.fixture(scope="module", params=TRACES)
def trace(request):
    return Trace(request.param)


def test_action_table_exact():
    """The whole 90-row DiscreteAction table, bit-exact
    (DiscreteAction.cpp:3-68)."""
    ref = np.load(os.path.join(GOLDEN, "gym_action_table.npz"))["table"]
    mine = np.asarray(DiscreteAction().table)
    np.testing.assert_array_equal(mine, ref)


def test_parsed_actions(trace):
    """Table lookup + demo-zeroing reproduces the reference's parsed
    actions (Match::ParseActions uses the PREVIOUS step's state for the
    demo check, Envs/Match.cpp:44-52)."""
    parser = DiscreteAction()
    step = ~trace.is_reset
    rows = np.where(step)[0]
    prev_demoed = trace.flags[rows - 1, :, 4] > 0.5  # row-1 = prev state
    mine = np.asarray(parser.to_action_vec(trace.action_idx[rows]))
    mine = np.where(prev_demoed[..., None], 0.0, mine)
    np.testing.assert_array_equal(mine, trace.parsed[rows])


def test_inverted_views(trace):
    """invert_vec/invert_rot and pad mirroring vs the reference's
    physInv/boostPadsInv (PhysObj.cpp:19-33, GameState.cpp:85-99)."""
    gs = trace.game_state()
    np.testing.assert_allclose(
        np.asarray(invert_vec(gs.ball_pos)), trace.ball_inv[:, 0:3],
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(invert_vec(gs.ball_vel)), trace.ball_inv[:, 3:6],
        atol=1e-4)
    inv_rot = np.asarray(invert_rot(gs.car_rot))
    np.testing.assert_allclose(inv_rot[..., :, 0],
                               trace.car_inv[..., 3:6], atol=1e-6)
    np.testing.assert_allclose(inv_rot[..., :, 1],
                               trace.car_inv[..., 6:9], atol=1e-6)
    np.testing.assert_allclose(inv_rot[..., :, 2],
                               trace.car_inv[..., 9:12], atol=1e-6)
    np.testing.assert_allclose(np.asarray(invert_vec(gs.car_pos)),
                               trace.car_inv[..., 0:3], atol=1e-4)
    np.testing.assert_array_equal(trace.pads[:, ::-1], trace.pads_inv)
    np.testing.assert_array_equal(trace.pad_timers[:, ::-1],
                                  trace.pad_timers_inv)


def test_obs_values(trace):
    """Obs float-for-float vs the reference builder. For DefaultOBSPadded
    the teammate/opponent groups are randomly shuffled by the reference
    (DefaultOBSPadded.cpp:63-65), so those are compared as sorted multisets
    of 19-float player blocks; the 70-float prefix (ball + prev action +
    pads + self) is compared in place."""
    gs = trace.game_state()
    prev_actions = jnp.asarray(trace.parsed)
    if trace.max_players:
        builder = DefaultOBSPadded(trace.max_players)
    else:
        builder = DefaultOBS()
    assert builder.obs_size(trace.P) == trace.obs_size
    mine = np.asarray(builder.build(gs, prev_actions, trace.teams))
    ref = trace.obs
    np.testing.assert_allclose(mine[..., :70], ref[..., :70],
                               atol=2e-5, rtol=1e-5)

    if not trace.max_players:
        np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=1e-5)
        return

    def sorted_blocks(arr, start, count):
        blk = arr[..., start:start + 19 * count]
        blk = blk.reshape(*blk.shape[:-1], count, 19)
        # lexicographic sort of the blocks inside each group
        flat = blk.reshape(-1, count, 19)
        keys = np.round(flat / 1e-4) * 1e-4  # tolerance-stable sort keys
        out = np.empty_like(flat)
        for i in range(flat.shape[0]):
            order = np.lexsort(keys[i].T[::-1])
            out[i] = flat[i][order]
        return out

    mc, mo = trace.max_players - 1, trace.max_players
    for (start, count) in ((70, mc), (70 + 19 * mc, mo)):
        np.testing.assert_allclose(
            sorted_blocks(mine, start, count),
            sorted_blocks(ref, start, count), atol=2e-5, rtol=1e-5)


def test_reward_values(trace):
    """Reward outputs vs the reference tree. EventReward's carry is the
    previous row's extracted value set (reference Reset/GetReward,
    CommonRewards.cpp:26-42), which rebuilding from row i-1 reproduces
    exactly — including across episode resets."""
    fn = reward_tree_for(trace.name)
    fn.bind_teams(trace.teams)
    rows = np.where(~trace.is_reset)[0]
    gs_prev = trace.game_state(rows - 1)
    gs_cur = trace.game_state(rows)
    carry = fn.init(gs_prev)
    mine, _ = fn.compute(gs_cur, jnp.asarray(trace.parsed[rows]),
                         jnp.asarray(trace.done[rows]), carry)
    np.testing.assert_allclose(np.asarray(mine), trace.rewards[rows],
                               atol=2e-4, rtol=2e-5)


def test_terminal_flags(trace):
    """NoTouch(40 steps) + GoalScore replayed over the rows match the
    reference's done flags."""
    from rlgymppo_cpp_tpu.sim import constants as C
    steps_since_touch = 0
    for i in range(trace.R):
        if trace.is_reset[i]:
            steps_since_touch = 0
            continue
        touched = bool((trace.flags[i, :, 5] > 0.5).any())
        steps_since_touch = 0 if touched else steps_since_touch + 1
        no_touch = steps_since_touch >= 40
        scored = abs(trace.ball[i, 1]) > (
            C.SOCCAR_GOAL_SCORE_BASE_THRESHOLD_Y
            + C.BALL_COLLISION_RADIUS_SOCCAR)
        assert (no_touch or scored) == bool(trace.done[i]), f"row {i}"
