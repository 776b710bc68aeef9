"""Run configuration dataclasses.

Same fields and defaults as the reference's aggregate config structs
(LearnerConfig.h:14-81, PPOLearnerConfig.h:6-32, SkillTrackerConfig.h:7-45),
minus thread-pool knobs that have no meaning in a single-program design —
`num_envs` replaces numThreads x numGamesPerThread.
"""

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass
class PPOLearnerConfig:
    policy_layer_sizes: Sequence[int] = (256, 256, 256)
    critic_layer_sizes: Sequence[int] = (256, 256, 256)
    batch_size: int = 50_000
    epochs: int = 10
    policy_lr: float = 3e-4
    critic_lr: float = 3e-4
    ent_coef: float = 0.005
    clip_range: float = 0.2
    mini_batch_size: int = 0          # 0 -> batch_size
    # bf16 matmuls during learn (the autocastLearn analog; native on MXU,
    # no grad scaler needed)
    bf16_learn: bool = False
    # bf16 params copy for rollout inference (halfPrecModels analog)
    bf16_inference: bool = False
    policy_temperature: float = 1.0
    # Window-shuffle granularity for the fused train step, in rows. An
    # optimizer step's gradient is a SUM over its batch, so the shuffle
    # (GetAllBatchesShuffled, PPOLearner.cpp:103-299) only matters through
    # the random PARTITION of the window into per-step batches — row order
    # inside a batch is irrelevant. Permuting contiguous blocks of rows
    # samples that partition at block granularity, turning the shuffle's
    # random row gather (measured 105 ms/iter at reference shape on a v5e
    # — the single hottest op of the learn phase, ~10 GB/s effective) into
    # contiguous ~45 KB DMAs (~20x faster). Block rows are the same-tick
    # obs of adjacent envs — with >=4k blocks per batch the partition is
    # statistically indistinguishable from row-level for these batch
    # sizes. 1 = exact row-level shuffle (used by parity tests); shapes
    # not divisible by the block size fall back to row-level.
    shuffle_block_rows: int = 128
    # Fused Pallas PPO gradient kernel (ops/pallas_ppo.py): both nets'
    # fwd+bwd in one pass with activations resident in VMEM — measured
    # 12 ms vs 34 ms per 524k-row batch on a v5e (the jnp autodiff path
    # round-trips ~10 GB of activations through HBM). "auto" = on for
    # TPU f32 learn at large batches; True forces it everywhere (interpret
    # mode off-TPU — tests); False = always jnp autodiff.
    fused_grad_kernel: object = "auto"
    measure_gradient_noise: bool = False
    gradient_noise_update_interval: int = 10
    gradient_noise_avg_decay: float = 0.9925


@dataclasses.dataclass
class SkillTrackerConfig:
    enabled: bool = False
    per_mode_ratings: bool = False
    num_envs: int = 64
    update_interval: int = 4          # iterations between rating evals
                                      # (SkillTrackerConfig.h:20)
    timesteps_per_version: int = 50_000_000
    max_versions: int = 4
    starting_rating: float = 1000.0   # initialRating (SkillTrackerConfig.h)
    rating_inc: float = 5.0           # ELO K-factor per goal
    initial_rating_carry: bool = True
    max_eval_seconds: float = 60.0
    # Eval matches start from neutral kickoffs, not the training state
    # setter — the reference's default (kickoffStatesOnly,
    # SkillTrackerConfig.h:39-41). Random-state eval starts make goals a
    # state lottery and flatline the rating (docs/ELO_DIAGNOSIS.md).
    kickoff_only: bool = True
    # Argmax actions for both policies is the reference's eval behavior
    # (SkillTracker.cpp:103-133) and the default. But argmax-vs-argmax
    # team eval degenerates into a handful of deterministic kickoff
    # duels: a tiny policy drift flips the repeated duel from always-win
    # to always-lose, producing bimodal 0.0/1.0 win fractions for
    # millions of steps while distribution-level skill is unchanged
    # (root-caused offline in docs/EVAL_DIAGNOSIS_R5.md: the "collapsed"
    # r4 3v3 checkpoint loses 1:265 to a pool member under argmax and
    # beats the same member 18:4 under sampling). Set False for team
    # self-play runs to measure the policy distribution instead.
    eval_deterministic: bool = True
    # Sampling temperature for eval_deterministic=False. Full-temperature
    # sampling (1.0) is only meaningful once the policy distribution has
    # sharpened: mid-run PPO policies sit near entropy ln(90) and sample
    # close to UNIFORMLY — both sides then play noise and every win
    # fraction collapses to ~0.5 regardless of skill (observed: flat
    # rating vs the initial RANDOM pool member 11M steps into a 2v2
    # run). A low temperature (~0.3) concentrates sampling on each
    # policy's preferred actions — skill expresses like argmax — while
    # still de-correlating repeated kickoff duels, which is the whole
    # point of sampling (docs/EVAL_DIAGNOSIS_R5.md).
    eval_temperature: float = 1.0


@dataclasses.dataclass
class LearnerConfig:
    # Env parallelism: one batch of lockstep arenas per device
    num_envs: int = 512
    render_mode: bool = False
    render_time_scale: float = 1.5
    # LearnerConfig.h:27: suppress the render-mode config override (one
    # env, no metrics/checkpoints) to render during a real training run
    render_during_training: bool = False

    timestep_limit: int = 0           # 0 -> unlimited
    exp_buffer_size: int = 100_000
    timesteps_per_iteration: int = 50_000
    standardize_returns: bool = True
    max_returns_per_stats_inc: int = 150
    deterministic: bool = False

    # Overlap next collection with learning (stale-policy rollout), the
    # collectionDuringLearn analog (LearnerConfig.h:44-46). Deliberate
    # default DEVIATION: the reference defaults it true because its CPU
    # collection and GPU learn run on different hardware and overlap for
    # free; here both phases share the one TPU, and the fused
    # single-program path (the default when eligible) already runs
    # rollout+learn in one XLA program, so pipelined stale-policy
    # dispatch only helps the non-fused path.
    collection_during_learn: bool = False

    # Fused-path reporting pipeline: dispatch iteration N, then fetch and
    # report iteration N-1 — the metrics round trip (multi-ms on a
    # tunneled TPU runtime) and all host-side report/callback work hide
    # behind device compute, and the device never idles between fused
    # steps. Reports stay exact and per-iteration, delivered one
    # iteration late (flushed before learn() returns). Skill evals rate
    # the dispatch-time policy snapshot; checkpoint saves are unaffected.
    async_report: bool = True

    # RG_PARANOID_MODE analog (RLGymPPO_CPP Framework.h:30-34,
    # GameTrajectory.h:12-24, ExperienceBuffer.cpp:72-88): thread a debug
    # counter through the rollout and validate counter monotonicity +
    # finite-ness of obs/rewards/log-probs every iteration, failing fast
    # like RG_ERR_CLOSE. Off by default (reference builds it out too).
    paranoid: bool = False

    ppo: PPOLearnerConfig = dataclasses.field(default_factory=PPOLearnerConfig)

    gae_lambda: float = 0.95
    gae_gamma: float = 0.99
    reward_clip_range: float = 10.0

    checkpoint_load_folder: Optional[str] = "checkpoints"
    checkpoint_save_folder: Optional[str] = "checkpoints"
    save_folder_add_unix_timestamp: bool = False
    timesteps_per_save: int = 500_000
    random_seed: int = 123
    checkpoints_to_keep: int = 5
    # Include the experience windows (EXP_BUFFER / FUSED_BUFFER) in every
    # checkpoint for bit-exact deterministic resume. Off by default: they
    # are hundreds of MB at reference shapes, and the reference's resume
    # semantics (models + stats, envs restart) don't need them.
    save_buffers: bool = False

    send_metrics: bool = True
    metrics_project_name: str = "rlgymppo-cpp-tpu"
    metrics_group_name: str = "unnamed-runs"
    metrics_run_name: str = "rlgymppo-cpp-tpu-run"

    skill_tracker: SkillTrackerConfig = dataclasses.field(
        default_factory=SkillTrackerConfig)
