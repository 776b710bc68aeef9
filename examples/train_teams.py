"""2v2 / 3v3 zero-sum self-play training (BASELINE.json configs #3/#4).

The team-play analog of examples/train_1v1.py: ZeroSumReward-wrapped
shaping + event rewards (ZeroSumReward.cpp:3-30), DefaultOBSPadded with
per-step slot shuffling (DefaultOBSPadded.cpp:41-65), ELO skill tracking
reporting the per-mode rating ("2v2"/"3v3", SkillTracker.cpp:19-25), and
the fused train step at examplemain economics (3-batch window).

Run:  python examples/train_teams.py --team-size 2 --envs 2048 \
          --timesteps 50000000 --log docs_train_2v2_r3.jsonl
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "rlgymppo_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from rlgymppo_cpp_tpu.gym import (
    Gym, Match, DiscreteAction, DefaultOBSPadded, CombinedReward,
    EventReward, FaceBallReward, VelocityPlayerToBallReward,
    VelocityBallToGoalReward, ZeroSumReward, NoTouchCondition,
    GoalScoreCondition, RandomState,
)
from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig
from rlgymppo_cpp_tpu.learn.config import SkillTrackerConfig

TICK_SKIP = 8
NO_TOUCH_TIMEOUT_SECS = 10.0


def make_match(team_size, max_players, team_spirit, opponent_scale):
    """Team-play match: 1v1-style shaping plus a zero-summed event reward.

    ZeroSum semantics (ZeroSumReward.cpp:3-30): each player gets
    r*(1-spirit) + teamAvg*spirit - oppAvg*oppScale. Only the sparse
    event reward is wrapped — zero-summing the dense shaping terms too
    would make the average step reward identically 0 (each player's
    shaping gain is cancelled by the opponents' mirror term), destroying
    the progress signal while adding nothing: shaping is not a
    competitive quantity. The event term (goals) IS competitive, and
    zero-summing it is what gives self-play its adversarial gradient.
    """
    rewards = CombinedReward([
        (FaceBallReward(), 0.1),
        (VelocityPlayerToBallReward(), 0.5),
        (VelocityBallToGoalReward(), 1.0),
        (ZeroSumReward(
            EventReward(team_goal=1.0, concede=-1.0, touch=0.05),
            team_spirit, opponent_scale), 50.0),
    ])
    return Match(
        reward_fn=rewards,
        terminal_conditions=[
            NoTouchCondition(int(NO_TOUCH_TIMEOUT_SECS * 120 / TICK_SKIP)),
            GoalScoreCondition(),
        ],
        obs_builder=DefaultOBSPadded(max_players),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=team_size, spawn_opponents=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--team-size", type=int, default=2, choices=(2, 3))
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--max-players", type=int, default=None,
                    help="padded obs slots per team (default team_size+1 "
                         "so pad slots are exercised)")
    ap.add_argument("--timesteps", type=int, default=0)
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--team-spirit", type=float, default=0.3)
    ap.add_argument("--opponent-scale", type=float, default=1.0)
    ap.add_argument("--log", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoints", default=None,
                    help="checkpoint folder (default per team size)")
    args = ap.parse_args()

    max_players = args.max_players or args.team_size + 1
    players = args.envs * args.team_size * 2
    ts_per_itr = max(1, round(100_000 / players)) * players

    ckpt_dir = args.checkpoints or f"checkpoints/train_{args.team_size}v" \
        f"{args.team_size}"
    cfg = LearnerConfig(
        num_envs=args.envs,
        timesteps_per_iteration=ts_per_itr,
        exp_buffer_size=ts_per_itr * 3,   # examplemain.cpp:119 economics
        timestep_limit=args.timesteps,
        random_seed=args.seed,
        ppo=PPOLearnerConfig(
            batch_size=ts_per_itr,
            mini_batch_size=ts_per_itr // 4,
            epochs=1,
            ent_coef=0.01,
            policy_lr=2e-4,
            critic_lr=2e-4,
            policy_layer_sizes=(256, 256, 256),
            critic_layer_sizes=(256, 256, 256),
        ),
        send_metrics=False,
        # Kickoff-only eval (reference default) + versions >=10M apart:
        # near-adjacent versions and random-state eval starts flatline the
        # rating even while the policy improves (docs/ELO_DIAGNOSIS.md).
        # eval_deterministic=False: argmax-vs-argmax team eval collapses
        # into a handful of deterministic kickoff duels whose outcome
        # flips with tiny policy drift (bimodal 0/1 win fractions for
        # millions of steps in the r3 AND r4 recorded runs); sampling
        # both policies measures distribution-level skill instead
        # (docs/EVAL_DIAGNOSIS_R5.md).
        # eval_temperature=0.35: FULL-temperature sampling is near-
        # uniform while policy entropy sits near ln(90) (mid-run PPO) —
        # both sides play noise and fractions pin at ~0.5. tau=0.35
        # sharpens onto each policy's preferred actions so skill
        # expresses, while keeping enough stochasticity to de-correlate
        # repeated kickoff duels.
        # 256 eval envs: sampled eval scores fewer goals per horizon
        # than argmax duels, so double the lockstep eval batch to keep
        # the per-eval goal sample statistically meaningful
        skill_tracker=SkillTrackerConfig(
            enabled=True, num_envs=256, update_interval=4,
            timesteps_per_version=10_000_000, max_versions=8,
            eval_deterministic=False, eval_temperature=0.35),
        checkpoint_save_folder=ckpt_dir,
        checkpoint_load_folder=ckpt_dir,
        # 500k-step saves (reference cadence at 70k sps) are every ~0.2s
        # of device time at TPU rates, and each full-resume snapshot is
        # a large tunnel fetch — save every 5M instead (10 per run)
        timesteps_per_save=5_000_000,
    )

    match = make_match(args.team_size, max_players, args.team_spirit,
                       args.opponent_scale)
    gym = Gym(match, num_envs=cfg.num_envs, tick_skip=TICK_SKIP)
    learner = Learner(gym, cfg)

    mode = f"{args.team_size}v{args.team_size}"
    log_f = open(args.log, "a") if args.log else None
    t0 = time.time()

    def on_iter(lrn, report):
        rec = {"ts": lrn.total_timesteps,
               "wall": round(time.time() - t0, 1)}
        for k in ("Average Step Reward", "Average Episode Reward",
                  "Policy Entropy", "Mean KL Divergence",
                  "Overall Steps/Second"):
            if k in report:
                rec[k.lower().replace(" ", "_")] = round(float(report[k]), 5)
        for k in report:
            if k.startswith(("Skill Rating", "Skill Eval", "Skill Pool")):
                rec[k.lower().replace(" ", "_")] = round(float(report[k]), 3)
        if "skill_eval_goals" in rec and lrn.last_skill_eval_stats:
            rec["skill_eval_per_opponent"] = {
                str(i): s["win_frac"] for i, s in
                lrn.last_skill_eval_stats["per_opponent"].items()}
        if log_f:
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
        if lrn.total_timesteps % 2_000_000 < cfg.timesteps_per_iteration:
            lrn.display_report(report)

    learner.iteration_callback = on_iter
    print(f"train_teams: {mode}, {args.envs} envs x "
          f"{gym.num_players} players, obs {gym.obs_size}, "
          f"{ts_per_itr} ts/iter (window x3)")
    learner.learn(iterations=args.iterations)


if __name__ == "__main__":
    main()
