"""Offline head-to-head replay of committed self-play checkpoints.

Diagnoses the round-4 eval collapse (VERDICT r4 item 1): loads the policy
from every numbered checkpoint in a training folder plus the final
checkpoint's frozen SKILL_POLICY pool, and plays each pair head-to-head
on the same kickoff-only eval the SkillTracker uses
(SkillTracker.cpp:87-163 semantics: DummyReward, deterministic actions,
team swap). Unlike the in-run eval, it ALSO plays each pair with sampled
actions — deterministic argmax policies replay a handful of fixed kickoff
duels, so a deterministic loss may be duel brittleness rather than a real
skill regression; the sampled win rate distinguishes the two.

Usage:
  python scripts/replay_headtohead.py --folder checkpoints/train_3v3 \
      --team-size 3 --envs 128 --seconds 60 --out docs/headtohead_3v3.json
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.gym import (
    Gym, Match, DiscreteAction, DefaultOBSPadded, NoTouchCondition,
    GoalScoreCondition, KickoffState,
)
from rlgymppo_cpp_tpu.learn.skill_tracker import DummyReward
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy
from rlgymppo_cpp_tpu.utils import checkpoint as ckpt

TICK_SKIP = 8


def build_gym(team_size, max_players, num_envs):
    match = Match(
        reward_fn=DummyReward(),
        terminal_conditions=[
            NoTouchCondition(int(10.0 * 120 / TICK_SKIP)),
            GoalScoreCondition(),
        ],
        obs_builder=DefaultOBSPadded(max_players),
        action_parser=DiscreteAction(),
        state_setter=KickoffState(),
        team_size=team_size, spawn_opponents=True,
    )
    return Gym(match, num_envs=num_envs, tick_skip=TICK_SKIP)


@functools.partial(jax.jit, static_argnames=("gym", "policy", "num_steps",
                                             "deterministic"))
def _duel(gym, policy, params_blue, params_orange, key, num_steps,
          deterministic):
    """A fixed pair of policies for num_steps; returns (blue, orange) goal
    counts summed over envs and steps."""
    N, P, O = gym.num_envs, gym.num_players, gym.obs_size
    teams = jnp.asarray(gym.match.teams)
    is_blue = (teams == 0)[None, :]

    key, sub = jax.random.split(key)
    gym_state, obs = gym.reset(sub)

    def body(carry, _):
        gym_state, obs, key = carry
        key, k_blue, k_orange, k_step = jax.random.split(key, 4)
        flat = obs.reshape(N * P, O)
        act_b, _ = policy.get_action(params_blue, flat, k_blue,
                                     deterministic=deterministic)
        act_o, _ = policy.get_action(params_orange, flat, k_orange,
                                     deterministic=deterministic)
        actions = jnp.where(is_blue, act_b.reshape(N, P),
                            act_o.reshape(N, P))
        gym_state, obs, _, done, info = gym.step(gym_state, actions, k_step)
        scored = info["scored"]
        blue_scored = info["game_state"].ball_pos[..., 1] > 0
        rec = (jnp.sum(scored & blue_scored), jnp.sum(scored & ~blue_scored))
        return (gym_state, obs, key), rec

    (_, _, _), (blue, orange) = jax.lax.scan(
        body, (gym_state, obs, key), None, length=num_steps)
    return jnp.sum(blue), jnp.sum(orange)


def load_policies(folder, policy_template):
    """-> (ordered {label: params}); labels ckpt_<ts> + pool_<i>@final."""
    ids = sorted(int(d) for d in os.listdir(folder) if d.isdigit())
    out = {}
    for ts in ids:
        path = os.path.join(folder, str(ts))
        data = np.load(os.path.join(path, "TRAIN_STATE.npz"))
        # TRAIN_STATE layout: policy params are the leading leaves
        # (ppo_learner.init: dict policy/value/policy_opt/value_opt —
        # dict order is insertion order, policy first)
        flat_t, treedef = jax.tree.flatten(policy_template)
        flat = [data[f"leaf_{i}"] for i in range(len(flat_t))]
        assert all(a.shape == b.shape for a, b in zip(flat, flat_t))
        out[f"ckpt_{ts}"] = jax.tree.unflatten(treedef, flat)
    final = os.path.join(folder, str(ids[-1]))
    meta = json.load(open(os.path.join(final, "RUNNING_STATS.json")))
    pool_ratings = meta["skill_tracker"]["old_ratings"]
    i = 0
    while True:
        p = ckpt.load_extra_tree(final, f"SKILL_POLICY_{i}", policy_template)
        if p is None:
            break
        mode = list(pool_ratings[i].keys())[0] if i < len(pool_ratings) else "?"
        r = pool_ratings[i][mode] if i < len(pool_ratings) else float("nan")
        out[f"pool_{i}(r={r:.0f})"] = p
        i += 1
    return out, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--folder", required=True)
    ap.add_argument("--team-size", type=int, default=3)
    ap.add_argument("--max-players", type=int, default=None)
    ap.add_argument("--envs", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=None)
    ap.add_argument("--subjects", default="ckpt",
                    help="comma globs of row labels to evaluate "
                         "(default: checkpoints only as rows)")
    args = ap.parse_args()

    max_players = args.max_players or args.team_size + 1
    gym = build_gym(args.team_size, max_players, args.envs)
    policy = DiscretePolicy(gym.obs_size, gym.action_amount)
    key = jax.random.PRNGKey(args.seed)
    kp, key = jax.random.split(key)
    template = policy.init(kp)

    policies, meta = load_policies(args.folder, template)
    labels = list(policies)
    rows = [l for l in labels if any(
        l.startswith(p) for p in args.subjects.split(","))]
    num_steps = max(1, int(args.seconds * 120 / TICK_SKIP))
    print(f"policies: {labels}")
    print(f"rows: {rows}; {args.envs} envs x {num_steps} steps per duel")

    results = {}
    for det in (True, False):
        mode = "deterministic" if det else "sampled"
        results[mode] = {}
        for a in rows:
            for b in labels:
                if a == b:
                    continue
                # a blue + a orange (team swap), summed
                key, k1, k2 = jax.random.split(key, 3)
                g_ab = _duel(gym, policy, policies[a], policies[b], k1,
                             num_steps, det)
                g_ba = _duel(gym, policy, policies[b], policies[a], k2,
                             num_steps, det)
                a_goals = int(g_ab[0]) + int(g_ba[1])
                b_goals = int(g_ab[1]) + int(g_ba[0])
                tot = a_goals + b_goals
                frac = a_goals / tot if tot else float("nan")
                results[mode][f"{a} vs {b}"] = {
                    "win_frac": round(frac, 4), "goals": tot,
                    "a_goals": a_goals, "b_goals": b_goals}
                print(f"[{mode}] {a} vs {b}: {frac if tot else float('nan'):.3f} "
                      f"({a_goals}:{b_goals})")

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"folder": args.folder, "envs": args.envs,
                       "seconds": args.seconds, "results": results}, f,
                      indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
