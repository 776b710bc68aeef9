"""Canonical 1v1 training program.

The analog of the reference's examplemain.cpp: same reward combination,
terminal conditions, obs/action setup and learner hyperparameters
(examplemain.cpp:58-151), with the thread-pool knobs replaced by one
`num_envs` batch of lockstep arenas.

Run:  python examples/train_1v1.py [--envs 4096] [--timesteps 10000000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persistent compile cache: the first arena-step compile is slow
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rlgymppo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

from rlgymppo_cpp_tpu.gym import (
    Gym, Match, DiscreteAction, DefaultOBS, CombinedReward, EventReward,
    FaceBallReward, VelocityPlayerToBallReward, VelocityBallToGoalReward,
    NoTouchCondition, GoalScoreCondition, RandomState,
)
from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig
from rlgymppo_cpp_tpu.learn.config import SkillTrackerConfig

TICK_SKIP = 8
NO_TOUCH_TIMEOUT_SECS = 10.0


def make_match():
    """EnvCreateFunc (examplemain.cpp:58-100)."""
    rewards = CombinedReward([
        (FaceBallReward(), 0.1),
        (VelocityPlayerToBallReward(), 0.5),
        (VelocityBallToGoalReward(), 1.0),
        (EventReward(team_goal=1.0, concede=-1.0), 50.0),
    ])
    return Match(
        reward_fn=rewards,
        terminal_conditions=[
            NoTouchCondition(int(NO_TOUCH_TIMEOUT_SECS * 120 / TICK_SKIP)),
            GoalScoreCondition(),
        ],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=True,
    )


def on_iteration(learner, report):
    """OnIteration (examplemain.cpp:38-55): print the iteration report."""
    learner.display_report(report)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--timesteps", type=int, default=0,
                    help="stop after this many timesteps (0 = unlimited)")
    ap.add_argument("--iterations", type=int, default=None)
    ap.add_argument("--no-metrics", action="store_true")
    ap.add_argument("--render", action="store_true")
    ap.add_argument("--skill-tracker", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="collide against the SDF-baked triangle-mesh "
                         "arena (sim/soccar_mesh.py) instead of the "
                         "analytic plane soup")
    ap.add_argument("--fillets", action="store_true",
                    help="analytic curved soccar bowl: quarter-cylinder "
                         "floor-wall transitions as closed-form "
                         "primitives — the realistic curved arena at "
                         "~9x the SDF mesh world's training speed "
                         "(arena_geom.make_soccar_geom(fillets=True))")
    ap.add_argument("--game-mode", default=None,
                    choices=("soccar", "hoops", "heatseeker", "snowday"),
                    help="game mode (GameMode.h:6-16; per-mode mutator "
                         "defaults applied by the arena, "
                         "MutatorConfig.cpp:29-34)")
    ap.add_argument("--hoops", action="store_true",
                    help="alias for --game-mode hoops; with --mesh uses "
                         "basket rim + ball-only net meshes "
                         "(sim/hoops_mesh.py)")
    ap.add_argument("--log", default=None,
                    help="append one JSON line per iteration to this file")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--checkpoints", default="checkpoints/train_1v1",
                    help="checkpoint save/load folder")
    ap.add_argument("--fused", action="store_true",
                    help="reference-default economics (buffer == batch == "
                         "one iteration window) so the Learner takes the "
                         "fused single-program train step")
    args = ap.parse_args()

    ts_per_itr = 100_000
    if args.fused:
        # fused eligibility needs horizon * envs * players == batch size
        players = args.envs * 2
        ts_per_itr = max(1, round(ts_per_itr / players)) * players
    cfg = LearnerConfig(
        num_envs=args.envs,
        timesteps_per_iteration=ts_per_itr,
        # examplemain.cpp:119 economics either way: the fused path carries
        # the 3-batch window on device (train_step.py buffer_mult)
        exp_buffer_size=ts_per_itr * 3,
        timestep_limit=args.timesteps,
        random_seed=args.seed,
        ppo=PPOLearnerConfig(
            batch_size=ts_per_itr,
            mini_batch_size=25_000,
            epochs=1,
            ent_coef=0.01,
            policy_lr=2e-4,
            critic_lr=2e-4,
            policy_layer_sizes=(256, 256, 256),
            critic_layer_sizes=(256, 256, 256),
        ),
        send_metrics=not args.no_metrics,
        render_mode=args.render,
        # kickoff-only eval + >=10M-step version gaps: see
        # docs/ELO_DIAGNOSIS.md for why tighter settings flatline
        skill_tracker=SkillTrackerConfig(
            enabled=args.skill_tracker, num_envs=128,
            timesteps_per_version=10_000_000, max_versions=8),
        checkpoint_save_folder=args.checkpoints,
        checkpoint_load_folder=args.checkpoints,
        # The reference's 500k-step default saves every ~7s of its 70k
        # sps compute; at 2.8M sps that cadence is every ~0.2s, and a
        # full-resume snapshot (params + env state + ring window) is a
        # ~150 MB device fetch — saves would dominate wall time 10:1
        # (observed on the first hoops demo run). 5M steps keeps 10+
        # checkpoints per 50M-step run.
        timesteps_per_save=5_000_000,
    )

    if args.fused:
        # keep examplemain's 4 minibatch updates per batch; the fused
        # train step shuffles + scans minibatches in-program
        cfg.ppo.mini_batch_size = ts_per_itr // 4

    from rlgymppo_cpp_tpu.sim.arena import GameMode
    if args.hoops:
        args.game_mode = "hoops"
    game_mode = {None: GameMode.SOCCAR,
                 "soccar": GameMode.SOCCAR,
                 "hoops": GameMode.HOOPS,
                 "heatseeker": GameMode.HEATSEEKER,
                 "snowday": GameMode.SNOWDAY}[args.game_mode]
    args.hoops = game_mode == GameMode.HOOPS
    geom = None
    if args.mesh and args.hoops:
        from rlgymppo_cpp_tpu.sim.hoops_mesh import make_hoops_mesh_geom
        geom = make_hoops_mesh_geom()
    elif args.mesh:
        from rlgymppo_cpp_tpu.sim.soccar_mesh import make_soccar_mesh_geom
        geom = make_soccar_mesh_geom()
    elif args.fillets:
        from rlgymppo_cpp_tpu.sim.arena_geom import make_soccar_geom
        geom = make_soccar_geom(fillets=True)

    match = make_match()
    gym = Gym(match, num_envs=cfg.num_envs, tick_skip=TICK_SKIP,
              game_mode=game_mode, geom=geom)
    learner = Learner(gym, cfg)
    if args.log:
        import json
        import time as _time
        log_f = open(args.log, "a")
        t0 = _time.time()

        def on_iter(lrn, report):
            rec = {"ts": lrn.total_timesteps,
                   "wall": round(_time.time() - t0, 1)}
            for k in ("Average Step Reward", "Average Episode Reward",
                      "Policy Entropy", "Mean KL Divergence",
                      "Overall Steps/Second"):
                if k in report:
                    rec[k.lower().replace(" ", "_")] = round(
                        float(report[k]), 5)
            for k in report:
                if k.startswith(("Skill Rating", "Skill Eval",
                                 "Skill Pool")):
                    rec[k.lower().replace(" ", "_")] = round(
                        float(report[k]), 3)
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            if lrn.total_timesteps % 2_000_000 < cfg.timesteps_per_iteration:
                on_iteration(lrn, report)

        learner.iteration_callback = on_iter
    else:
        learner.iteration_callback = on_iteration
    learner.learn(iterations=args.iterations)


if __name__ == "__main__":
    main()
