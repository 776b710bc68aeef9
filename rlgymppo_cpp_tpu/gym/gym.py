"""Batched Gym: Match + tick-skip stepping + auto-reset.

Functional re-design of RLGymSim_CPP's Gym/Match (src/RLGymSim_CPP/Gym.cpp,
Envs/Match.cpp) plus the auto-reset behavior of RLGymPPO_CPP's GameInst
(src/public/RLGymPPO_CPP/Threading/GameInst.cpp:7-38): N envs advance in
lockstep inside jitted code; episodes that end are reset in-batch by masked
writes and their next observation comes from the fresh state, exactly like
GameInst returning `Reset()`'s obs.

Step semantics replicate the 1-tick action delay (Gym.cpp:68-102):
apply new controls -> 1 tick -> snapshot for obs/reward/done ->
(tickSkip-1) more ticks.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.car_config import CAR_CONFIG_OCTANE
from rlgymppo_cpp_tpu.sim.game_event_tracker import (
    GameEventTracker, GameEventTrackerConfig,
)
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.mutators import MutatorConfig
from rlgymppo_cpp_tpu.sim.state import ArenaState
from rlgymppo_cpp_tpu.gym import common_values as CV
from rlgymppo_cpp_tpu.gym.gamestate import make_game_state

COUNTER_KEYS = ("goals", "saves", "assists", "shots", "shot_passes",
                "bumps", "demos", "pickups")


class Match:
    """Bundle of the 5 user-pluggable policies (Match.h:13-46)."""

    def __init__(self, reward_fn, terminal_conditions, obs_builder,
                 action_parser, state_setter, team_size=1,
                 spawn_opponents=True):
        self.reward_fn = reward_fn
        self.terminal_conditions = list(terminal_conditions)
        self.obs_builder = obs_builder
        self.action_parser = action_parser
        self.state_setter = state_setter
        self.team_size = team_size
        self.spawn_opponents = spawn_opponents
        # Interleave teams like Gym's ctor (Gym.cpp:45-49)
        teams = []
        for _ in range(team_size):
            teams.append(0)
            if spawn_opponents:
                teams.append(1)
        self.teams = np.asarray(teams, dtype=np.int32)
        reward_fn.bind_teams(self.teams)


@struct.dataclass
class GymState:
    """Everything a batch of envs carries between steps."""
    arena: ArenaState
    prev_actions: jnp.ndarray    # [N, P, 8] float action rows
    counters: dict               # per-player int32 match counters
    score_line: jnp.ndarray      # [N, 2]
    last_touch: jnp.ndarray      # [N]
    event_tracker: object        # EventTrackerState
    reward_carry: object
    terminal_carries: tuple
    episode_reward: jnp.ndarray  # [N, P] accumulated (for metrics)
    episode_steps: jnp.ndarray   # [N]


class Gym:
    """N lockstep envs of one Match configuration."""

    def __init__(self, match: Match, num_envs: int, tick_skip: int = 8,
                 car_config=CAR_CONFIG_OCTANE,
                 game_mode: GameMode = GameMode.SOCCAR,
                 mutator_config: MutatorConfig = None,
                 event_tracker_config: GameEventTrackerConfig = None,
                 arena_config=None, geom=None):
        """`geom` swaps the arena's static world: None -> the analytic
        plane soup; a sim.mesh_geom.MeshGeom -> SDF-baked triangle meshes
        (the analog of RocketSim::Init loading .cmf meshes,
        RocketSim.cpp:102-212). Every suspension ray and ball/car world
        contact inside training then queries the mesh world."""
        self.match = match
        self.num_envs = num_envs
        self.tick_skip = tick_skip
        self.action_delay = tick_skip - 1
        self.arena = Arena(game_mode=game_mode, teams=match.teams,
                           car_config=car_config,
                           mutator_config=mutator_config,
                           arena_config=arena_config, geom=geom)
        self.num_players = self.arena.num_players
        self.event_tracker = GameEventTracker(self.arena,
                                              event_tracker_config)
        if self.arena.num_pads:
            self.pad_index_map = CV.boost_pad_index_map(
                np.asarray(self.arena.pad_pos))
        else:
            self.pad_index_map = np.zeros(34, np.int32)
        self.obs_size = match.obs_builder.obs_size(self.num_players)
        self.action_amount = match.action_parser.action_amount

    def with_num_envs(self, num_envs):
        """Same Match/arena configuration at a different batch size (used
        by the Learner's render-mode override, Learner.cpp:38-51)."""
        return Gym(self.match, num_envs, tick_skip=self.tick_skip,
                   car_config=self.arena.car_config,
                   game_mode=self.arena.game_mode,
                   mutator_config=self.arena.mut,
                   event_tracker_config=self.event_tracker.config,
                   arena_config=self.arena.arena_config,
                   geom=self.arena.geom)

    # ------------------------------------------------------------------ reset

    def _zero_counters(self):
        shape = (self.num_envs, self.num_players)
        return {k: jnp.zeros(shape, jnp.int32) for k in COUNTER_KEYS}

    def _game_state(self, arena_state, counters, score_line, last_touch):
        return make_game_state(
            self.arena, arena_state, self.tick_skip, counters, score_line,
            last_touch, self.pad_index_map)

    def reset(self, key):
        """-> (GymState, obs [N, P, obs_size])."""
        N = self.num_envs
        key, k1, k2 = jax.random.split(key, 3)
        blank = self.arena.default_state((N,))
        arena_state = self.match.state_setter.reset(self.arena, blank, k1)

        counters = self._zero_counters()
        score_line = jnp.zeros((N, 2), jnp.int32)
        last_touch = jnp.full((N,), -1, jnp.int32)
        gs = self._game_state(arena_state, counters, score_line, last_touch)

        prev_actions = jnp.zeros((N, self.num_players, 8), jnp.float32)
        obs = self.match.obs_builder.build(gs, prev_actions,
                                           self.match.teams, key=k2)
        state = GymState(
            arena=arena_state,
            prev_actions=prev_actions,
            counters=counters,
            score_line=score_line,
            last_touch=last_touch,
            event_tracker=self.event_tracker.init((N,)),
            reward_carry=self.match.reward_fn.init(gs),
            terminal_carries=tuple(
                c.init((N,)) for c in self.match.terminal_conditions),
            episode_reward=jnp.zeros((N, self.num_players), jnp.float32),
            episode_steps=jnp.zeros((N,), jnp.int32),
        )
        return state, obs

    # ------------------------------------------------------------------- step

    def step(self, state: GymState, action_indices, key):
        """One env step for the whole batch.

        Returns (GymState', obs, rewards [N, P], done [N], info dict).
        `obs` already reflects auto-resets (done envs return fresh obs).
        """
        match = self.match
        teams = match.teams
        key, k_t1, k_t2, k_reset, k_obs = jax.random.split(key, 5)

        controls = match.action_parser.parse(
            action_indices, demoed=state.arena.cars.is_demoed)
        action_vec = match.action_parser.to_action_vec(action_indices)
        action_vec = jnp.where(state.arena.cars.is_demoed[..., None],
                               0.0, action_vec)

        # Phase 1: action-delay tick, then snapshot
        arena1, ev1 = self.arena.step(state.arena, controls, k_t1, 1)
        counters = dict(state.counters)
        counters["bumps"] = counters["bumps"] + ev1["bump"]
        counters["demos"] = counters["demos"] + ev1["demo"]
        counters["pickups"] = counters["pickups"] + ev1["pickup"]

        # Score detection at the snapshot (GameState.cpp:96-99)
        scored = self.arena.is_ball_scored(arena1.ball.pos)
        scoring_team = jnp.where(arena1.ball.pos[..., 1] > 0, 0, 1)  # 1-TEAM_FROM_Y
        score_line = state.score_line + jnp.where(
            scored[..., None],
            jax.nn.one_hot(scoring_team, 2, dtype=jnp.int32), 0)

        # Shot/goal/save/assist events (eventTracker.Update, Gym.cpp:83)
        tracker_state, game_events = self.event_tracker.update(
            state.event_tracker, arena1, scored, self.tick_skip)
        for k in ("goals", "assists", "shots", "shot_passes", "saves"):
            counters[k] = counters[k] + game_events[k]

        gs = self._game_state(arena1, counters, score_line, state.last_touch)

        # Phase 2: remaining ticks under the same controls
        arena2, ev2 = self.arena.step(arena1, controls, k_t2,
                                      self.action_delay)
        counters["bumps"] = counters["bumps"] + ev2["bump"]
        counters["demos"] = counters["demos"] + ev2["demo"]
        counters["pickups"] = counters["pickups"] + ev2["pickup"]

        # Terminals (Match::IsDone) and rewards (Match::GetRewards)
        done = jnp.zeros((self.num_envs,), bool)
        new_tcarries = []
        for cond, carry in zip(match.terminal_conditions,
                               state.terminal_carries):
            d, c = cond.check(gs, carry)
            done = done | d
            new_tcarries.append(c)
        rewards, reward_carry = match.reward_fn.compute(
            gs, action_vec, done, state.reward_carry)

        episode_reward = state.episode_reward + rewards
        episode_steps = state.episode_steps + 1

        # ---- auto-reset done envs (GameInst.cpp:27-32) ----
        blank = self.arena.default_state((self.num_envs,))
        reset_arena = match.state_setter.reset(self.arena, blank, k_reset)
        zero_counters = self._zero_counters()
        zero_score = jnp.zeros_like(score_line)
        zero_touch = jnp.full_like(state.last_touch, -1)
        reset_gs = self._game_state(reset_arena, zero_counters, zero_score,
                                    zero_touch)

        def merge(reset_val, cur_val):
            if isinstance(reset_val, jnp.ndarray) and reset_val.ndim:
                mask = jnp.reshape(
                    done, done.shape + (1,) * (reset_val.ndim - done.ndim))
                return jnp.where(mask, reset_val, cur_val)
            return cur_val

        merged_arena = jax.tree.map(merge, reset_arena, arena2)
        merged_counters = {k: merge(zero_counters[k], counters[k])
                           for k in counters}
        merged_score = merge(zero_score, score_line)
        merged_touch = merge(zero_touch, gs.last_touch_idx)
        merged_gs = jax.tree.map(merge, reset_gs, gs)
        merged_prev = merge(jnp.zeros_like(action_vec), action_vec)

        reward_carry = jax.tree.map(
            merge, match.reward_fn.init(merged_gs), reward_carry)
        new_tcarries = tuple(
            cond.reset_carry(c, done)
            for cond, c in zip(match.terminal_conditions, new_tcarries))

        obs = match.obs_builder.build(merged_gs, merged_prev, teams,
                                      key=k_obs)

        info = {
            "game_state": gs,
            "episode_reward": episode_reward,
            "episode_steps": episode_steps,
            "scored": scored,
        }
        tracker_state = jax.tree.map(
            merge, self.event_tracker.init((self.num_envs,)), tracker_state)

        new_state = GymState(
            arena=merged_arena,
            prev_actions=merged_prev,
            counters=merged_counters,
            score_line=merged_score,
            last_touch=merged_touch,
            event_tracker=tracker_state,
            reward_carry=reward_carry,
            terminal_carries=new_tcarries,
            episode_reward=jnp.where(done[..., None], 0.0, episode_reward),
            episode_steps=jnp.where(done, 0, episode_steps),
        )
        return new_state, obs, rewards, done, info
