"""Learning-curve sanity run: 1v0 drive-to-ball must visibly learn.

This is the framework's analog of the reference's learning-parity testing
(README.md:29-30): run the full stack (rollout -> GAE -> buffer -> PPO)
for N iterations and verify Average Step Reward trends up. Writes one JSON
line per iteration to --log.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rlgymppo_tpu_jax_cache_dev")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from rlgymppo_cpp_tpu.gym import (
    Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
    VelocityPlayerToBallReward, FaceBallReward, TouchBallReward,
    NoTouchCondition, GoalScoreCondition, RandomState,
)
from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--iterations", type=int, default=60)
    ap.add_argument("--log", default="/tmp/learning_check.jsonl")
    ap.add_argument("--opponents", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="train on the SDF-baked mesh arena world")
    ap.add_argument("--fillets", action="store_true",
                    help="train on the analytic curved-bowl world "
                         "(quarter-cylinder floor-wall fillets)")
    ap.add_argument("--skill-tracker", action="store_true")
    ap.add_argument("--ts-base", type=int, default=50_000,
                    help="approximate timesteps per iteration")
    ap.add_argument("--shuffle-block-rows", type=int, default=None,
                    help="override ppo.shuffle_block_rows (1 = exact "
                         "row-level GetAllBatchesShuffled; default 128 "
                         "block partition) for curve A/Bs")
    ap.add_argument("--bf16-inference", action="store_true",
                    help="rollout infers with a bf16 param copy "
                         "(halfPrecModels analog) for curve parity runs")
    ap.add_argument("--sync-report", action="store_true",
                    help="disable async_report (per-iteration metric "
                         "fetch blocks the device) for pipeline A/Bs")
    ap.add_argument("--mini-batches", type=int, default=1,
                    help="minibatches per batch (default 1 = whole-batch "
                         "update). >1 engages the shuffled-minibatch "
                         "path, which the shuffle_block_rows A/B needs — "
                         "with one minibatch no shuffle ever happens")
    args = ap.parse_args()

    match = Match(
        reward_fn=CombinedReward([
            (FaceBallReward(), 0.1),
            (VelocityPlayerToBallReward(), 0.5),
            (TouchBallReward(), 20.0),
        ]),
        terminal_conditions=[NoTouchCondition(150), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, False, False),
        team_size=1, spawn_opponents=args.opponents,
    )
    geom = None
    if args.mesh:
        from rlgymppo_cpp_tpu.sim.soccar_mesh import make_soccar_mesh_geom
        geom = make_soccar_mesh_geom()
    elif args.fillets:
        from rlgymppo_cpp_tpu.sim.arena_geom import make_soccar_geom
        geom = make_soccar_geom(fillets=True)
    gym = Gym(match, num_envs=args.envs, tick_skip=8, geom=geom)

    # round to a whole rollout window so the Learner takes the fused path
    players = gym.num_envs * gym.num_players
    ts_per_itr = max(1, round(args.ts_base / players)) * players
    cfg = LearnerConfig(
        num_envs=args.envs,
        timesteps_per_iteration=ts_per_itr,
        exp_buffer_size=ts_per_itr,
        ppo=PPOLearnerConfig(
            batch_size=ts_per_itr,
            mini_batch_size=0 if args.mini_batches <= 1
            else ts_per_itr // args.mini_batches, epochs=2,
            ent_coef=0.01, policy_lr=2e-4, critic_lr=2e-4,
            bf16_inference=args.bf16_inference),
        standardize_returns=True,
        send_metrics=False,
        checkpoint_save_folder=None, checkpoint_load_folder=None,
    )
    if args.shuffle_block_rows is not None:
        cfg.ppo.shuffle_block_rows = args.shuffle_block_rows
    if args.sync_report:
        cfg.async_report = False
    if args.skill_tracker:
        from rlgymppo_cpp_tpu.learn.config import SkillTrackerConfig
        cfg.skill_tracker = SkillTrackerConfig(
            enabled=True, num_envs=64,
            timesteps_per_version=5_000_000, max_versions=6)
    learner = Learner(gym, cfg)

    log = open(args.log, "w")
    t0 = time.time()

    def on_iter(lrn, report):
        rec = {"iter": len(open(args.log).readlines()) + 1,
               "ts": lrn.total_timesteps,
               "wall": round(time.time() - t0, 1),
               "avg_step_reward": report.get("Average Step Reward"),
               "avg_ep_reward": report.get("Average Episode Reward"),
               "entropy": report.get("Policy Entropy"),
               "kl": report.get("Mean KL Divergence"),
               "sps": report.get("Overall Steps/Second")}
        for k in report:
            if k.startswith("Skill Rating"):
                rec[k.lower().replace(" ", "_")] = round(float(report[k]), 2)
        log.write(json.dumps(rec) + "\n")
        log.flush()

    learner.iteration_callback = on_iter
    learner.learn(iterations=args.iterations)


if __name__ == "__main__":
    main()
