"""ELO self-play skill evaluation.

TPU-native re-design of the reference's SkillTracker
(src/private/RLGymPPO_CPP/Util/SkillTracker.{h,cpp}): instead of fanning
eval games across threads, all eval arenas advance in one jitted lax.scan.
Each env plays the current policy against a randomly-chosen old version
with randomized team assignment (team_swap, SkillTracker.h:15-28); old
versions are cheap param-pytree snapshots stacked on a leading axis so each
env can gather its opponent's weights inside the scan. Goal events are
returned per (step, env) and replayed on the host in order for the
sequential per-goal ELO update (UpdateRatings, SkillTracker.cpp:72-85),
preserving the reference's rating dynamics exactly.

Eval semantics preserved (SkillTracker.cpp:87-257):
- deterministic actions for both policies;
- DummyReward + optional kickoff-only state setter;
- sim budget of `sim_time` seconds split across envs;
- snapshot current policy + rating every `timesteps_per_version`,
  keeping at most `max_versions`;
- ratings per mode name ("1v1", "2v2", "1v0"...).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.gym.gym import Gym, Match
from rlgymppo_cpp_tpu.gym.rewards import RewardFunction
from rlgymppo_cpp_tpu.gym.state_setters import KickoffState
from rlgymppo_cpp_tpu.learn.config import SkillTrackerConfig


class DummyReward(RewardFunction):
    """Zero reward for eval games (SkillTracker.cpp:11-15)."""

    def compute(self, gs, prev_actions, final, carry):
        return jnp.zeros(gs.car_pos.shape[:-1], jnp.float32), carry


def mode_name(match: Match) -> str:
    """ModeNameFromGameInst (SkillTracker.cpp:19-25)."""
    if match.spawn_opponents:
        return f"{match.team_size}v{match.team_size}"
    return f"{match.team_size}v0"


class SkillTracker:
    def __init__(self, config: SkillTrackerConfig, train_match: Match,
                 policy, tick_skip=8, game_mode=None, car_config=None,
                 render_sender=None, rng=None):
        self.config = config
        self.policy = policy
        self.render_sender = render_sender
        self.rng = rng or np.random.default_rng(0)

        eval_match = Match(
            reward_fn=DummyReward(),
            terminal_conditions=train_match.terminal_conditions,
            obs_builder=train_match.obs_builder,
            action_parser=train_match.action_parser,
            state_setter=KickoffState() if config.kickoff_only
            else train_match.state_setter,
            team_size=train_match.team_size,
            spawn_opponents=train_match.spawn_opponents,
        )
        gym_kwargs = {}
        if game_mode is not None:
            gym_kwargs["game_mode"] = game_mode
        if car_config is not None:
            gym_kwargs["car_config"] = car_config
        self.gym = Gym(eval_match, num_envs=config.num_envs,
                       tick_skip=tick_skip, **gym_kwargs)
        self.mode = mode_name(eval_match)

        self.cur_rating = {self.mode: config.starting_rating}
        self.old_params = []          # list of param pytrees
        self.old_ratings = []         # list of {mode: rating}
        self.timesteps_since_version = 0
        self.run_counter = 0

        self._gym_state = None
        self._obs = None
        self._key = jax.random.PRNGKey(int(self.rng.integers(1 << 30)))
        self.last_eval_stats = None

    # -------------------------------------------------------------- ELO math

    # The reference evaluates 4 CPU envs for 60s — order tens of goals
    # per eval (SkillTrackerConfig.h:18-19). A lockstep device batch
    # plays every env the full horizon, which can produce HUNDREDS of
    # kickoff goals per eval; per-goal K = rating_inc would then
    # re-equilibrate the rating against whichever opponents were sampled
    # THIS eval (observed +-200 point swings). Normalizing K by the goal
    # volume keeps per-eval rating movement at the reference's
    # magnitude while using every goal's information.
    REFERENCE_GOALS_PER_EVAL = 25.0

    def _update_ratings(self, winner: dict, loser: dict, k: float):
        """Per-goal ELO, K scaled to reference eval volume
        (SkillTracker.cpp:72-85)."""
        exp_delta = (loser[self.mode] - winner[self.mode]) / 400.0
        expected = 1.0 / (10.0 ** exp_delta + 1.0)
        winner[self.mode] += k * (1.0 - expected)
        loser[self.mode] += k * (expected - 1.0)

    # ------------------------------------------------------------ eval scan

    @functools.partial(jax.jit, static_argnames=("self", "num_steps",
                                                 "deterministic"))
    def _eval_rollout(self, cur_params, old_stack, gym_state, obs,
                      team_swap, old_idx, num_valid, key, num_steps,
                      deterministic=True):
        """Lockstep eval of all envs for num_steps.

        old_stack: param pytree with a constant [max_versions] leading
        axis, entries >= num_valid being padding (never sampled).
        team_swap [N] bool: True -> old policy plays blue. Returns
        per-step goal records. `deterministic=False` samples both
        policies (config.eval_deterministic rationale).
        """
        gym = self.gym
        N, P, O = gym.num_envs, gym.num_players, gym.obs_size
        teams = jnp.asarray(gym.match.teams)          # [P]
        temp = float(self.config.eval_temperature)

        def act(params, obs, key):
            """Eval action selection: argmax when deterministic, else
            temperature-sharpened sampling (config.eval_temperature —
            tau < 1 keeps the skill signal of argmax while
            de-correlating repeated kickoff duels)."""
            if deterministic or temp == 1.0:
                return self.policy.get_action(
                    params, obs, key, deterministic=deterministic)[0]
            probs = self.policy.get_action_probs(params, obs)
            return jax.random.categorical(
                key, jnp.log(probs) / temp, axis=-1)

        V = len(jax.tree.leaves(old_stack)) and jax.tree.leaves(
            old_stack)[0].shape[0]

        def body(carry, _):
            gym_state, obs, team_swap, old_idx, key = carry
            key, k_step, k_reset, k_cur, k_old = jax.random.split(key, 5)

            flat_obs = obs.reshape(N * P, O)
            cur_act = act(cur_params, flat_obs, k_cur)
            # Old-policy actions: run EVERY pool version on the full
            # batch and select per env. A per-env parameter gather
            # (old_stack[old_idx] -> [N, ...] weight copies) moves
            # ~N x 1 MB of weights per scan step and made the eval scan
            # ~8x slower than training itself (75% of a 50M team run's
            # wall); V extra small-batch forwards are ~free next to
            # that. Unrolled Python loop (V = padded max_versions,
            # static) rather than vmap so each forward stays a plain
            # call the Pallas-kernel gate understands.
            keys_old = jax.random.split(k_old, V)
            all_old = jnp.stack([
                act(jax.tree.map(lambda x: x[v], old_stack),
                    flat_obs, keys_old[v]).reshape(N, P)
                for v in range(V)])                       # [V, N, P]
            old_act = jnp.take_along_axis(
                all_old, old_idx[None, :, None].astype(jnp.int32),
                axis=0)[0]                                # [N, P]
            cur_act = cur_act.reshape(N, P)

            # old plays blue when team_swap; player is blue when teams==0
            is_blue = (teams == 0)[None, :]            # [1, P]
            use_old = jnp.where(team_swap[:, None], is_blue, ~is_blue)
            actions = jnp.where(use_old, old_act, cur_act)

            gym_state, obs, _, done, info = gym.step(
                gym_state, actions, k_step)

            scored = info["scored"]
            ball_y = info["game_state"].ball_pos[..., 1]
            blue_scored = ball_y > 0
            # scoringPolicy == cur iff (blue scored) != (old plays blue)
            cur_scored = blue_scored ^ team_swap

            rec = {"scored": scored, "cur_scored": cur_scored,
                   "old_idx": old_idx}

            # game.Reset on done: new random swap + opponent version
            # (sampled from the VALID prefix of the padded stack)
            k_swap, k_old = jax.random.split(k_reset)
            new_swap = jax.random.bernoulli(k_swap, shape=(N,))
            new_old = jax.random.randint(k_old, (N,), 0, num_valid)
            team_swap2 = jnp.where(done, new_swap, team_swap)
            old_idx2 = jnp.where(done, new_old, old_idx)
            return (gym_state, obs, team_swap2, old_idx2, key), rec

        (gym_state, obs, team_swap, old_idx, key), recs = jax.lax.scan(
            body, (gym_state, obs, team_swap, old_idx, key), None,
            length=num_steps)
        return gym_state, obs, team_swap, old_idx, recs

    # ------------------------------------------------------------- run games

    def run_games(self, cur_params, timesteps_delta: int):
        """SkillTracker::RunGames (SkillTracker.cpp:165-257). Mutates
        ratings; returns the current rating dict."""
        cfg = self.config
        if self.run_counter % cfg.update_interval != 0:
            # SkillTracker.cpp:168-171 skips eval between updateInterval
            # iterations; unlike the reference we still accrue the
            # timestep delta toward version snapshots (the reference
            # silently drops skipped-iteration deltas)
            self.run_counter += 1
            self._advance_version(cur_params, timesteps_delta)
            return self.cur_rating
        self.run_counter += 1

        if not self.old_params:
            self.old_params.append(jax.tree.map(jnp.copy, cur_params))
            self.old_ratings.append(dict(self.cur_rating))

        gym = self.gym
        N = gym.num_envs
        # The reference splits simTime across games because each CPU game
        # costs wall time (SkillTracker.cpp:185 simTime/numEnvs). On a
        # lockstep device batch, stepping all N envs costs the same as one,
        # so every env runs the FULL sim-time horizon — N x the reference's
        # goal sample per eval at equal device time, which keeps the ELO
        # signal from starving at large N.
        num_steps = max(1, int(cfg.max_eval_seconds * 120 / gym.tick_skip))

        if self._gym_state is None:
            self._key, sub = jax.random.split(self._key)
            self._gym_state, self._obs = gym.reset(sub)
            self._key, k1, k2 = jax.random.split(self._key, 3)
            self._team_swap = jax.random.bernoulli(k1, shape=(N,))
            self._old_idx = jnp.zeros((N,), jnp.int32)

        # pad the version stack to max_versions so its shape is constant
        # across the whole run — otherwise every new snapshot changes the
        # leading axis and re-compiles the eval scan (~minutes each)
        num_valid = len(self.old_params)
        padded = self.old_params + [self.old_params[-1]] * (
            cfg.max_versions - num_valid)
        old_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
        self._old_idx = jnp.minimum(self._old_idx, num_valid - 1)

        self._key, sub = jax.random.split(self._key)
        self._gym_state, self._obs, self._team_swap, self._old_idx, recs = \
            self._eval_rollout(cur_params, old_stack, self._gym_state,
                               self._obs, self._team_swap, self._old_idx,
                               jnp.int32(num_valid), sub, num_steps,
                               deterministic=cfg.eval_deterministic)

        scored = np.asarray(recs["scored"])          # [T, N]
        cur_scored = np.asarray(recs["cur_scored"])
        old_idx = np.asarray(recs["old_idx"])
        rating_before = self.cur_rating[self.mode]
        cur_goals = 0
        total_goals = int(scored.sum())
        per_opp = {}                  # version idx -> [cur_goals, opp_goals]
        k_eff = self.config.rating_inc * min(
            1.0, self.REFERENCE_GOALS_PER_EVAL / max(total_goals, 1))
        for t, n in zip(*np.nonzero(scored)):
            idx = int(old_idx[t, n])
            rating_old = self.old_ratings[idx]
            pair = per_opp.setdefault(idx, [0, 0])
            if cur_scored[t, n]:
                cur_goals += 1
                pair[0] += 1
                self._update_ratings(self.cur_rating, rating_old, k_eff)
            else:
                pair[1] += 1
                self._update_ratings(rating_old, self.cur_rating, k_eff)

        # Eval-volume diagnostics: a flat rating is only meaningful if the
        # eval actually produced goals and the win fraction is resolved —
        # otherwise the signal is starved, not the skill equal
        # (docs/ELO_DIAGNOSIS.md).
        goals = int(scored.sum())
        self.last_eval_stats = {
            "goals": goals,
            "cur_goal_fraction": cur_goals / goals if goals else 0.5,
            "rating_delta": self.cur_rating[self.mode] - rating_before,
            "num_versions": len(self.old_params),
            "pool_rating_spread": (
                max(r[self.mode] for r in self.old_ratings)
                - min(r[self.mode] for r in self.old_ratings)),
            # per-version head-to-head: which pool members the current
            # policy is actually losing its eval goals to (VERDICT r4
            # item 1 instrumentation)
            "per_opponent": {
                idx: {"cur_goals": c, "opp_goals": o,
                      "win_frac": c / (c + o) if c + o else 0.5}
                for idx, (c, o) in sorted(per_opp.items())},
        }

        self._advance_version(cur_params, timesteps_delta)
        return self.cur_rating

    def _advance_version(self, cur_params, timesteps_delta):
        cfg = self.config
        self.timesteps_since_version += timesteps_delta
        if self.timesteps_since_version >= cfg.timesteps_per_version:
            self.timesteps_since_version = 0
            self._gym_state = None    # reset all eval games
            self.old_params.append(jax.tree.map(jnp.copy, cur_params))
            self.old_ratings.append(dict(self.cur_rating))
            if len(self.old_params) > cfg.max_versions:
                self.old_params.pop(0)
                self.old_ratings.pop(0)

    # ------------------------------------------------------------ checkpoint

    def state_dict(self):
        return {
            "cur_rating": dict(self.cur_rating),
            "old_ratings": [dict(r) for r in self.old_ratings],
            "timesteps_since_version": int(self.timesteps_since_version),
            "run_counter": int(self.run_counter),
        }

    def load_state_dict(self, d, old_params=None):
        self.cur_rating = dict(d.get("cur_rating", self.cur_rating))
        self.old_ratings = [dict(r) for r in d.get("old_ratings", [])]
        self.timesteps_since_version = d.get("timesteps_since_version", 0)
        self.run_counter = d.get("run_counter", 0)
        if old_params is not None:
            self.old_params = list(old_params)
        if len(self.old_ratings) != len(self.old_params):
            n = min(len(self.old_ratings), len(self.old_params))
            self.old_ratings = self.old_ratings[:n] or [
                dict(self.cur_rating)] * len(self.old_params)
