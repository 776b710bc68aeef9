"""Top-level training orchestrator.

The Learner ties collection, GAE, the experience buffer and PPO into the
reference's iteration loop (Learner::Learn, src/public/RLGymPPO_CPP/
Learner.cpp:436-606): collect a timestep quota, AddNewExperience (value
predictions + GAE + return-stat update + buffer submit, :608-703), run PPO,
report metrics, checkpoint with retention GC. Deterministic resume follows
the same numbered-checkpoint-folder convention.

Where the reference juggles collection threads, the collection here is one
jitted scan; `collection_during_learn` overlap comes from JAX's async
dispatch (the next rollout is dispatched before blocking on the PPO update).
"""

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from rlgymppo_cpp_tpu.learn.config import LearnerConfig
from rlgymppo_cpp_tpu.learn.experience_buffer import ExperienceBuffer
from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
from rlgymppo_cpp_tpu.ops.gae import compute_gae
from rlgymppo_cpp_tpu.ops.welford import (
    welford_init, welford_update_batch, welford_std,
)
from rlgymppo_cpp_tpu.utils.report import Report
from rlgymppo_cpp_tpu.utils.timer import Timer
from rlgymppo_cpp_tpu.utils import checkpoint as ckpt

REPORT_ORDER = [
    "Average Step Reward", "Average Episode Reward", None,
    "Policy Entropy", "Mean KL Divergence", "Mean Ratio",
    "Value Function Loss", "SB3 Clip Fraction",
    "Policy Update Magnitude", "Value Function Update Magnitude",
    "Avg Return", "Avg Advantage", "Avg Val Target", None,
    "Collection Time", "Consumption Time", "Total Iteration Time",
    "Collected Steps/Second", "Overall Steps/Second",
    "Cumulative Timesteps", "Cumulative Model Updates",
]


class Learner:
    def __init__(self, gym, config: LearnerConfig = None,
                 step_metrics_fn=None, mesh=None):
        """`gym` may be a single Gym or a list of Gyms (heterogeneous env
        groups; all groups must share obs_size/action_amount).

        `step_metrics_fn(game_state, rewards, done) -> {name: scalar}` is
        the batched step-callback analog; its outputs are averaged over
        each iteration's window and merged into the report.

        `mesh` (parallel.make_mesh) shards the whole training run: env
        state data-parallel over the mesh's env axis, params replicated
        (or TP-sharded over the model axis); XLA inserts the gradient
        psums (SURVEY.md §5.8)."""
        self.config = config or LearnerConfig()
        self.step_metrics_fn = step_metrics_fn
        self.mesh = mesh
        cfg = self.config
        if cfg.render_mode and not cfg.render_during_training:
            # Render-mode config override (Learner.cpp:38-51): the
            # reference forces numThreads = numGamesPerThread = 1 and
            # disables metrics/checkpoints. Enforce it — rendering env 0
            # of a 4096-env batch in real time wastes the whole batch.
            # (timestepsPerIteration=inf is NOT mirrored: here it is the
            # jitted scan length, and the rendered collect path already
            # paces in real time per step.)
            print("Learner: Render mode is enabled, overriding:")
            if not isinstance(gym, (list, tuple)) and gym.num_envs > 1:
                gym = gym.with_num_envs(1)
                print("  > num_envs = 1 (rebuilt render Gym)")
            cfg.send_metrics = False
            print("  > send_metrics = False")
            cfg.checkpoint_save_folder = ""
            print("  > checkpoint_save_folder = none")
        if cfg.save_folder_add_unix_timestamp and cfg.checkpoint_save_folder:
            # LearnerConfig.h:58-60: suffix the save folder with the run's
            # unix start time so successive runs never collide
            cfg.checkpoint_save_folder = (
                f"{cfg.checkpoint_save_folder}-{int(time.time())}")
        self.multi = isinstance(gym, (list, tuple))
        self.gym = gym

        self.key = jax.random.PRNGKey(cfg.random_seed)

        if self.multi:
            from rlgymppo_cpp_tpu.learn.rollout import MultiGymCollector
            first = gym[0]
            self.obs_size = first.obs_size
            self.action_amount = first.action_amount
        else:
            first = gym
            self.obs_size = gym.obs_size
            self.action_amount = gym.action_amount
        print(f"Learner: Got obs size {self.obs_size} and "
              f"action amount {self.action_amount}")

        self.ppo = PPOLearner(self.obs_size, self.action_amount, cfg.ppo,
                              mesh=self.mesh)
        self.key, sub = jax.random.split(self.key)
        self.train_state = self.ppo.init(sub)
        if self.mesh is not None:
            from rlgymppo_cpp_tpu.parallel import shard_train_state
            self.train_state = shard_train_state(self.train_state,
                                                 self.mesh)

        self.exp_buffer = ExperienceBuffer(cfg.exp_buffer_size, self.obs_size)
        self.return_stats = welford_init(1)
        if self.multi:
            self.collector = MultiGymCollector(
                gym, self.ppo.policy, deterministic=cfg.deterministic,
                step_metrics_fn=step_metrics_fn)
        else:
            self.collector = RolloutCollector(
                gym, self.ppo.policy, deterministic=cfg.deterministic,
                step_metrics_fn=step_metrics_fn, paranoid=cfg.paranoid)

        self.skill_tracker = None
        if cfg.skill_tracker.enabled:
            from rlgymppo_cpp_tpu.learn.skill_tracker import SkillTracker
            self.skill_tracker = SkillTracker(
                cfg.skill_tracker, first.match, self.ppo.policy,
                tick_skip=first.tick_skip, game_mode=first.arena.game_mode,
                car_config=first.arena.car_config,
                rng=np.random.default_rng(cfg.random_seed))

        self.total_timesteps = 0
        self.total_epochs = 0
        self.iteration_callback = None
        self._last_game_metrics = None
        self.last_skill_eval_stats = None

        # steps per iteration, counted like the reference in player-steps
        if self.multi:
            self.players_per_step = self.collector.players_per_step
        else:
            self.players_per_step = gym.num_envs * gym.num_players
        self.steps_per_iter = max(
            1, cfg.timesteps_per_iteration // self.players_per_step)

        self._gym_state = None
        self._obs = None
        self._pending_rollout = None
        self._pending_iter = None       # async_report in-flight iteration
        self._last_finalize_t = None
        self._last_save_ts = 0
        self._restore_env_path = None
        self.run_id = None

        # The reference's default economics collect exactly one batch per
        # iteration and keep a K-batch experience window (examplemain.cpp:
        # 115-124: expBufferSize = 3 * batchSize), running one optimizer
        # step per shuffled batch. When the config matches that shape
        # (any integer K), the whole iteration fuses into ONE compiled
        # program (learn/train_step.py) carrying the K-1 previous batches
        # on device — no host round trips between collect, GAE and PPO.
        # This is the TPU headline path; the eager 3-phase path below
        # covers every other configuration.
        self._train_step = None
        self._fused_buffer = None
        self._fused_K = (cfg.exp_buffer_size // cfg.ppo.batch_size
                         if cfg.ppo.batch_size
                         and cfg.exp_buffer_size % cfg.ppo.batch_size == 0
                         else 0)
        self._fused_ineligible_reasons = reasons = []
        if self.multi:
            reasons.append("multiple gym groups (MultiGymCollector runs "
                           "per-group rollouts)")
        if cfg.ppo.measure_gradient_noise:
            reasons.append("measure_gradient_noise needs per-minibatch "
                           "gradients, which only the eager path exposes")
        if self._fused_K < 1:
            reasons.append(
                f"exp_buffer_size ({cfg.exp_buffer_size}) is not an "
                f"integer multiple of batch_size ({cfg.ppo.batch_size})")
        elif self._fused_K > 8:
            reasons.append(
                f"experience window K = exp_buffer_size/batch_size = "
                f"{self._fused_K} exceeds the fused path's limit of 8 "
                f"(K shuffled batch passes are unrolled into the one "
                f"compiled program)")
        if (self.steps_per_iter * self.players_per_step
                != cfg.ppo.batch_size):
            reasons.append(
                f"timesteps per iteration ({self.steps_per_iter} steps x "
                f"{self.players_per_step} players = "
                f"{self.steps_per_iter * self.players_per_step}) != "
                f"batch_size ({cfg.ppo.batch_size}); the fused program "
                f"consumes exactly one collected batch per iteration")
        self._fused_eligible = not cfg.render_mode and not reasons
        if reasons and not cfg.render_mode:
            # Dropping off the fused path is a multi-x throughput cliff
            # (host round trips between collect, GAE and PPO) — name every
            # cause instead of silently taking the eager path (the
            # reference prints its config overrides too, Learner.cpp:38-51)
            print("Learner: WARNING config is not eligible for the fused "
                  "single-program train path; using the eager 3-phase "
                  "path (expect lower throughput). Reasons:")
            for r in reasons:
                print(f"  > {r}")

        if cfg.checkpoint_load_folder:
            self.load()

        self.metric_sender = None
        if cfg.send_metrics:
            from rlgymppo_cpp_tpu.utils.metric_sender import MetricSender
            self.metric_sender = MetricSender(
                cfg.metrics_project_name, cfg.metrics_group_name,
                cfg.metrics_run_name, run_id=self.run_id)
            self.run_id = self.metric_sender.run_id

        self.render_sender = None
        if cfg.render_mode:
            from rlgymppo_cpp_tpu.utils.render_sender import RenderSender
            self.render_sender = RenderSender(gym)

    # ------------------------------------------------------------ checkpoint

    def save(self):
        cfg = self.config
        if not cfg.checkpoint_save_folder:
            return
        stats = {
            "cumulative_timesteps": int(self.total_timesteps),
            "cumulative_model_updates": int(self.ppo.cumulative_model_updates),
            "epoch": int(self.total_epochs),
            "run_id": getattr(self, "run_id", None),
            "obs_size": int(self.obs_size),
            "action_amount": int(self.action_amount),
            "policy_layer_sizes": list(cfg.ppo.policy_layer_sizes),
            "critic_layer_sizes": list(cfg.ppo.critic_layer_sizes),
            "reward_running_stats": {
                "mean": np.asarray(self.return_stats.mean).tolist(),
                "m2": np.asarray(self.return_stats.m2).tolist(),
                "count": int(self.return_stats.count),
            },
        }
        if self.skill_tracker is not None:
            stats["skill_tracker"] = self.skill_tracker.state_dict()
            st = self.skill_tracker.state_dict()
            stats["skill_rating"] = st["cur_rating"]
        # Deterministic resume (SURVEY §5.3, beyond the reference which
        # saves neither): PRNG keys + live env state + experience buffer
        # make save -> load -> N iterations equal an uninterrupted run.
        stats["learner_prng_key"] = np.asarray(self.key).tolist()
        path = ckpt.save_checkpoint(
            cfg.checkpoint_save_folder, self.total_timesteps,
            self.train_state, stats, keep=cfg.checkpoints_to_keep)
        if self.skill_tracker is not None:
            for i, p in enumerate(self.skill_tracker.old_params):
                ckpt.save_extra_tree(path, f"SKILL_POLICY_{i}", p)
        if self._gym_state is not None:
            ckpt.save_extra_tree(path, "ENV_STATE",
                                 (self._gym_state, self._obs))
        # The experience windows are by far the heaviest payload (hundreds
        # of MB at reference shapes — the reference's checkpoints carry
        # models + stats only and cost ~2 MB, LearnerConfig.h:67 keeps the
        # same 500k cadence). Saving them every 500k steps turned ~90 ms
        # iterations into multi-second stalls, so they are opt-in: without
        # them a resumed run re-warms the window from fresh experience
        # (exactly the reference's partially-filled-buffer behavior).
        if cfg.save_buffers:
            if self.exp_buffer.cur_size > 0:
                ckpt.save_extra_tree(
                    path, "EXP_BUFFER",
                    {"data": self.exp_buffer.data,
                     "cur_size": jnp.int32(self.exp_buffer.cur_size)})
            if self._fused_buffer:
                ckpt.save_extra_tree(path, "FUSED_BUFFER",
                                     self._fused_buffer)
        print(f"Learner: Saved checkpoint to {path}")

    def load(self):
        cfg = self.config
        path = ckpt.find_newest_checkpoint(cfg.checkpoint_load_folder)
        if path is None:
            return
        print(f"Learner: Loading checkpoint from {path}")
        self.train_state, meta = ckpt.load_checkpoint(path, self.train_state)
        self.total_timesteps = meta.get("cumulative_timesteps", 0)
        self.total_epochs = meta.get("epoch", 0)
        self.run_id = meta.get("run_id")
        self.ppo.cumulative_model_updates = meta.get(
            "cumulative_model_updates", 0)
        if self.skill_tracker is not None and "skill_tracker" in meta:
            old_params = []
            i = 0
            while True:
                p = ckpt.load_extra_tree(path, f"SKILL_POLICY_{i}",
                                         self.train_state["policy"])
                if p is None:
                    break
                old_params.append(p)
                i += 1
            self.skill_tracker.load_state_dict(meta["skill_tracker"],
                                               old_params)
        rs = meta.get("reward_running_stats")
        if rs:
            self.return_stats = self.return_stats.replace(
                mean=jnp.asarray(rs["mean"], jnp.float32),
                m2=jnp.asarray(rs["m2"], jnp.float32),
                count=jnp.asarray(rs["count"], jnp.int32))
        pk = meta.get("learner_prng_key")
        if pk is not None:
            self.key = jnp.asarray(pk, jnp.uint32)
        # Env/buffer state load is deferred to learn(): the pytree
        # templates only exist after the first reset.
        self._restore_env_path = path
        buf = ckpt.load_extra_tree(
            path, "EXP_BUFFER",
            {"data": self.exp_buffer.data, "cur_size": jnp.int32(0)})
        if buf is not None:
            self.exp_buffer.data = buf["data"]
            self.exp_buffer.cur_size = int(buf["cur_size"])
        if self._fused_K > 1:
            from rlgymppo_cpp_tpu.learn.train_step import init_fused_buffer
            template = init_fused_buffer(
                self._fused_K, cfg.ppo.batch_size, self.obs_size)
            try:
                fbuf = ckpt.load_extra_tree(path, "FUSED_BUFFER", template)
            except (KeyError, ValueError):
                fbuf = None   # pre-ring checkpoint layout: re-warm instead
            if fbuf is not None and all(
                    np.asarray(fbuf[k]).shape == template[k].shape
                    for k in template):
                self._fused_buffer = jax.tree.map(jnp.asarray, fbuf)
        self._last_save_ts = self.total_timesteps

    # -------------------------------------------------------------- pipeline

    def _rollout_policy_params(self):
        """Params the rollout scan infers with. With bf16_inference, a
        bfloat16 copy of the policy (the halfPrecModels analog,
        PPOLearner.cpp:41-53): matmuls run bf16 on the MXU, activations
        still accumulate f32 (models/mlp.py), learn stays full precision."""
        params = self.train_state["policy"]
        if self.config.ppo.bf16_inference:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), params)
        return params

    def _predict_values(self, obs_seq):
        """Critic over [T+1, B, O] in one fused call."""
        return self.ppo.value_net.forward(self.train_state["value"], obs_seq)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _consume_jit(self, value_params, obs_seq, rewards, dones,
                     truncateds, return_stats):
        """The device math of AddNewExperience in ONE program: critic
        forward, GAE, Welford update, report scalars (eager per-op
        dispatch here cost ~0.8s/iteration through the device tunnel)."""
        cfg = self.config
        values = self.ppo.value_net.forward(value_params, obs_seq)
        ret_std = welford_std(return_stats)[0] \
            if cfg.standardize_returns else jnp.float32(1.0)
        advantages, value_targets, returns = compute_gae(
            rewards, dones, truncateds, values,
            cfg.gae_gamma, cfg.gae_lambda, ret_std, cfg.reward_clip_range)
        if cfg.standardize_returns:
            n_inc = min(cfg.max_returns_per_stats_inc, returns.shape[0])
            return_stats = welford_update_batch(
                return_stats, returns[:n_inc].reshape(-1)[:, None])
        report = jnp.stack([
            jnp.mean(jnp.abs(returns)) / ret_std,
            jnp.mean(jnp.abs(advantages)),
            jnp.mean(jnp.abs(value_targets))])
        return advantages, value_targets, return_stats, report

    def add_new_experience(self, traj, last_obs, report: Report):
        """Learner::AddNewExperience (Learner.cpp:608-703): value preds,
        GAE, return stats, buffer submit. Accepts [T, N, P, ...] trajs
        (single gym) or player-flattened [T, B, ...] (multi-gym)."""
        cfg = self.config
        T = traj["obs"].shape[0]
        O = traj["obs"].shape[-1]
        if traj["obs"].ndim == 4:
            N, P = traj["obs"].shape[1:3]
            B = N * P
            rewards = traj["rewards"].reshape(T, B)
            dones = jnp.broadcast_to(
                traj["dones"][:, :, None], (T, N, P)).reshape(T, B)
            truncateds = jnp.broadcast_to(
                traj["truncateds"][:, :, None], (T, N, P)).reshape(T, B)
        else:
            B = traj["obs"].shape[1]
            rewards = traj["rewards"]
            dones = traj["dones"]
            truncateds = traj["truncateds"]

        if isinstance(last_obs, (list, tuple)):
            last_obs = jnp.concatenate(
                [o.reshape(-1, O) for o in last_obs], axis=0)

        obs_seq = jnp.concatenate(
            [traj["obs"].reshape(T, B, O), last_obs.reshape(1, B, O)], axis=0)

        advantages, value_targets, self.return_stats, rep = \
            self._consume_jit(
                self.train_state["value"], obs_seq,
                rewards.astype(jnp.float32), dones.astype(jnp.float32),
                truncateds.astype(jnp.float32), self.return_stats)
        rep = np.asarray(rep)
        report["Avg Return"] = float(rep[0])
        report["Avg Advantage"] = float(rep[1])
        report["Avg Val Target"] = float(rep[2])

        self.exp_buffer.submit_experience({
            "states": obs_seq[:-1].reshape(T * B, O),
            "actions": traj["actions"].reshape(T * B).astype(jnp.int32),
            "log_probs": traj["log_probs"].reshape(T * B),
            "values": value_targets.reshape(T * B),
            "advantages": advantages.reshape(T * B),
        })

    # ------------------------------------------------------------ fused path

    def _fused_warm(self):
        """K > 1 fused needs the K-1 previous batches. The eager path runs
        the warmup iterations (reference semantics: batches over the
        partially-filled buffer, ExperienceBuffer.cpp); once the host
        buffer holds K-1 batches they seed the on-device fused buffer."""
        if self._fused_K <= 1 or self._fused_buffer is not None:
            return True
        batch = self.config.ppo.batch_size
        need = (self._fused_K - 1) * batch
        if self.exp_buffer.cur_size < need:
            return False
        data = self.exp_buffer.data
        end = self.exp_buffer.cur_size
        # Ring layout: the K-1 warmup batches fill slots 0..K-2 (oldest
        # first) and the write pointer starts at the empty last slot —
        # the first fused call overwrites it with fresh experience, so
        # the window is 100% real from the first fused iteration.
        self._fused_buffer = {
            k: jnp.concatenate([
                jnp.asarray(data[k][end - need:end]),
                jnp.zeros((batch,) + data[k].shape[1:],
                          jnp.asarray(data[k][:1]).dtype)], axis=0)
            for k in ("states", "actions", "log_probs", "values",
                      "advantages")}
        self._fused_buffer["slot"] = jnp.int32(self._fused_K - 1)
        return True

    def _dispatch_fused(self):
        """Dispatch one fused train step (async — nothing is fetched).
        Returns the device-backed metrics dict and the steps collected."""
        cfg = self.config
        if self._train_step is None:
            from rlgymppo_cpp_tpu.learn.train_step import make_train_step
            self._train_step = make_train_step(
                self.gym, self.ppo, cfg, self.steps_per_iter,
                deterministic=cfg.deterministic,
                step_metrics_fn=self.step_metrics_fn,
                paranoid=cfg.paranoid, buffer_mult=self._fused_K)
        if self._fused_buffer is None:
            self._fused_buffer = {}   # K == 1: no carried batches
        self.key, sub = jax.random.split(self.key)
        (self.train_state, self._gym_state, self._obs, self.return_stats,
         self._fused_buffer, metrics) = self._train_step(
            self.train_state, self._gym_state, self._obs,
            self.return_stats, self._fused_buffer, sub)
        self.ppo.cumulative_model_updates += cfg.ppo.epochs * self._fused_K
        return metrics, self.steps_per_iter * self.players_per_step

    def _finalize_fused(self, metrics, report: Report):
        """Fetch a dispatched step's metrics and populate its report.
        The device_get here is the only host sync of a fused iteration;
        with async_report it runs AFTER the next step was dispatched, so
        the fetch's tunnel round trip and all host-side report work
        overlap with the next iteration's device compute."""
        cfg = self.config
        m = {k: float(v) for k, v in jax.device_get(metrics).items()}
        if cfg.paranoid and m.pop("paranoid_ok", 1.0) != 1.0:
            raise RuntimeError(
                "PARANOID: trajectory validation failed (non-finite "
                "obs/rewards/log-probs or debug-counter mismatch)")
        report["Average Step Reward"] = m.pop("avg_step_reward")
        report["Average Episode Reward"] = m.pop("avg_episode_reward")
        report["Policy Entropy"] = m.pop("entropy")
        report["Mean KL Divergence"] = m.pop("kl")
        report["Mean Ratio"] = m.pop("ratio")
        report["Value Function Loss"] = m.pop("value_loss")
        report["SB3 Clip Fraction"] = m.pop("clip_fraction")
        report["Policy Update Magnitude"] = m.pop("policy_update_mag")
        report["Value Function Update Magnitude"] = m.pop("value_update_mag")
        report["Avg Return"] = m.pop("avg_return")
        report["Avg Advantage"] = m.pop("avg_advantage")
        report["Avg Val Target"] = m.pop("avg_val_target")
        report["Cumulative Model Updates"] = self.ppo.cumulative_model_updates
        self._last_game_metrics = dict(m)
        for k, v in m.items():
            if k != "episodes_finished":
                report[k] = v

    def _finalize_iteration(self, pend):
        """Complete a (possibly pipelined) fused iteration: fetch its
        metrics, time it, and run the post-iteration work. `pend` is the
        (metrics, report, ts_collected, policy_params, cum_ts, t_dispatch)
        tuple captured at dispatch."""
        metrics, report, ts_collected, policy_params, cum_ts, t_disp = pend
        self._finalize_fused(metrics, report)
        # Iteration time = the period between successive metric
        # availabilities (device step time when device-bound, host loop
        # time when host-bound) — the honest sustained rate either way.
        now = time.perf_counter()
        iter_time = now - (self._last_finalize_t if self._last_finalize_t
                           is not None else t_disp)
        self._last_finalize_t = now
        report["Total Iteration Time"] = iter_time
        report["Overall Steps/Second"] = ts_collected / max(iter_time, 1e-9)
        report["Cumulative Timesteps"] = cum_ts
        self._post_iteration(report, ts_collected,
                             policy_params=policy_params,
                             report_total_ts=cum_ts)

    def _post_iteration(self, report: Report, ts_collected: int,
                        policy_params=None, report_total_ts=None):
        """Skill eval, callbacks, metric send, periodic save — shared by
        the fused and eager iteration paths (Learner.cpp:527-597).

        With async_report the learner has already dispatched the NEXT
        step when this runs: `policy_params` is the dispatch-time policy
        snapshot (so skill eval rates the policy that produced this
        report, not the newer in-flight one) and `report_total_ts` is the
        cumulative count as of this iteration (restored around the user
        callback so `learner.total_timesteps` reads consistently there).
        Checkpoint saves use the live counter + live train state — both
        post-dispatch, hence mutually consistent for deterministic
        resume."""
        cfg = self.config
        if self.skill_tracker is not None:
            ratings = self.skill_tracker.run_games(
                policy_params if policy_params is not None
                else self.train_state["policy"], ts_collected)
            for mode, r in ratings.items():
                report[f"Skill Rating {mode}".strip()] = r
            stats = self.skill_tracker.last_eval_stats
            if stats is not None:
                report["Skill Eval Goals"] = stats["goals"]
                report["Skill Eval Win Fraction"] = \
                    stats["cur_goal_fraction"]
                report["Skill Pool Spread"] = stats["pool_rating_spread"]
                # full stats (incl. per-opponent head-to-head) stay
                # readable by the iteration callback
                self.last_skill_eval_stats = stats
                self.skill_tracker.last_eval_stats = None

        if self.iteration_callback or self.metric_sender is not None:
            live_ts = self.total_timesteps
            if report_total_ts is not None:
                self.total_timesteps = report_total_ts
            try:
                if self.iteration_callback:
                    self.iteration_callback(self, report)
                if self.metric_sender is not None:
                    self.metric_sender.send(report)
            finally:
                self.total_timesteps = live_ts

        if cfg.checkpoint_save_folder and cfg.timesteps_per_save and (
                self.total_timesteps - self._last_save_ts
                >= cfg.timesteps_per_save):
            self.save()
            self._last_save_ts = self.total_timesteps

    # ------------------------------------------------------------------ main

    def learn(self, iterations=None):
        """Main loop until timestep_limit (or `iterations`)."""
        cfg = self.config
        if self._gym_state is None:
            # On resume, the reset only builds the pytree TEMPLATE for
            # the saved env state — use a throwaway key so the learner
            # key sequence matches the uninterrupted run exactly.
            restoring = bool(self._restore_env_path) and os.path.exists(
                os.path.join(self._restore_env_path, "ENV_STATE.npz"))
            if restoring:
                sub = jax.random.PRNGKey(0)
            else:
                self.key, sub = jax.random.split(self.key)
            if self.multi:
                self._gym_state, self._obs = self.collector.reset(sub)
            else:
                self._gym_state, self._obs = self.gym.reset(sub)
            if self.mesh is not None:
                from rlgymppo_cpp_tpu.parallel import make_global_env_tree
                self._gym_state = make_global_env_tree(
                    self._gym_state, self.mesh)
                self._obs = make_global_env_tree(self._obs, self.mesh)
            if restoring:
                self._gym_state, self._obs = ckpt.load_extra_tree(
                    self._restore_env_path, "ENV_STATE",
                    (self._gym_state, self._obs))
                if self.mesh is not None:
                    from rlgymppo_cpp_tpu.parallel import \
                        make_global_env_tree
                    self._gym_state = make_global_env_tree(
                        self._gym_state, self.mesh)
                    self._obs = make_global_env_tree(self._obs, self.mesh)
                print("Learner: Restored env state for deterministic "
                      "resume")
            self._restore_env_path = None

        total_timer = Timer()
        start_ts = self.total_timesteps
        it = 0
        while True:
            if iterations is not None and it >= iterations:
                break
            if cfg.timestep_limit and self.total_timesteps >= cfg.timestep_limit:
                print(f"Learner: Timestep limit of {cfg.timestep_limit} "
                      "reached, stopping")
                break
            it += 1
            report = Report()
            iter_timer = Timer()

            if self._fused_eligible and self._fused_warm():
                # collect/GAE/PPO are one device program here; the split
                # timings of the eager path don't exist. Overall SPS is
                # the honest number (Learner.cpp:541-570).
                t_disp = time.perf_counter()
                metrics, ts_collected = self._dispatch_fused()
                self.total_timesteps += ts_collected
                self.total_epochs += cfg.ppo.epochs
                pend = (metrics, report, ts_collected,
                        self.train_state["policy"], self.total_timesteps,
                        t_disp)
                if cfg.async_report:
                    # Pipelined reporting: finalize the PREVIOUS
                    # iteration now that this one is queued, hiding the
                    # metrics fetch + callback host time behind device
                    # compute (the fused-path analog of the reference's
                    # collectionDuringLearn overlap, LearnerConfig.h:46)
                    prev, self._pending_iter = self._pending_iter, pend
                    if prev is not None:
                        self._finalize_iteration(prev)
                else:
                    self._finalize_iteration(pend)
                continue

            # ---- collection (eager path) ----
            # if the fused path ran before (warmup handoff), flush its
            # pipeline and reset the period clock for the eager timers
            if self._pending_iter is not None:
                self._finalize_iteration(self._pending_iter)
                self._pending_iter = None
            self._last_finalize_t = None
            self.key, sub = jax.random.split(self.key)
            if self.render_sender is not None:
                self._gym_state, self._obs, traj, col_metrics = \
                    self.collector.collect_rendered(
                        self._rollout_policy_params(), self._gym_state,
                        self._obs, sub, self.steps_per_iter,
                        self.render_sender, cfg.render_time_scale)
            elif cfg.collection_during_learn:
                # Pipelined collection (collectionDuringLearn,
                # LearnerConfig.h:44-46): consume the rollout dispatched
                # last iteration (collected under the pre-update "stale"
                # policy) and immediately queue the next one, so the device
                # work of rollout k+1 lines up behind update k without a
                # host round trip.
                if self._pending_rollout is None:
                    self._pending_rollout = self.collector.collect(
                        self._rollout_policy_params(), self._gym_state,
                        self._obs, sub, self.steps_per_iter)
                    self.key, sub = jax.random.split(self.key)
                self._gym_state, self._obs, traj, col_metrics = \
                    self._pending_rollout
                self._pending_rollout = self.collector.collect(
                    self._rollout_policy_params(), self._gym_state,
                    self._obs, sub, self.steps_per_iter)
            else:
                self._gym_state, self._obs, traj, col_metrics = \
                    self.collector.collect(
                        self._rollout_policy_params(), self._gym_state,
                        self._obs, sub, self.steps_per_iter)
            jax.block_until_ready(traj["rewards"])
            collect_time = iter_timer.elapsed()

            ts_collected = self.steps_per_iter * self.players_per_step
            self.total_timesteps += ts_collected

            col_host = jax.device_get(col_metrics)
            if cfg.paranoid and float(
                    col_host.pop("paranoid_ok", 1.0)) != 1.0:
                raise RuntimeError(
                    "PARANOID: trajectory validation failed (non-finite "
                    "obs/rewards/log-probs or debug-counter mismatch)")
            report["Average Step Reward"] = float(
                col_host["avg_step_reward"])
            report["Average Episode Reward"] = float(
                col_host["avg_episode_reward"])
            groups = col_host.pop("groups", None)
            self._last_game_metrics = {
                k: float(v) for k, v in col_host.items()}
            if groups is not None:
                # Per-group breakdown (Learner.cpp:709-721 grants user
                # callbacks per-game metric access; per config group is
                # the on-device granularity)
                self._last_game_metrics["groups"] = {
                    name: {k: float(v) for k, v in g.items()}
                    for name, g in groups.items()}
            for k, v in self._last_game_metrics.items():
                if k not in ("avg_step_reward", "avg_episode_reward",
                             "episodes_finished", "groups"):
                    report[k] = v

            # ---- consumption ----
            consume_timer = Timer()
            self.add_new_experience(traj, self._obs, report)
            self.key, sub = jax.random.split(self.key)
            self.train_state, ppo_report = self.ppo.learn(
                self.train_state, self.exp_buffer, sub)
            report.update(ppo_report)
            consume_time = consume_timer.elapsed()

            self.total_epochs += cfg.ppo.epochs

            # ---- accounting (Learner.cpp:541-570) ----
            # With pipelined collection, collect+consume can exceed the
            # iteration wall time; the overlap-corrected "true collection
            # time" keeps SPS honest like the reference (Learner.cpp:547-555)
            iter_time = iter_timer.elapsed()
            overlap = max(collect_time + consume_time - iter_time, 0.0)
            true_collect = max(collect_time - overlap, 1e-9)
            report["Collection Time"] = collect_time
            report["Consumption Time"] = consume_time
            if cfg.collection_during_learn:
                report["Collect-Consume Overlap Time"] = overlap
            report["Total Iteration Time"] = iter_time
            report["Collected Steps/Second"] = ts_collected / true_collect
            report["Overall Steps/Second"] = ts_collected / max(
                iter_time, 1e-9)
            report["Cumulative Timesteps"] = self.total_timesteps
            self._post_iteration(report, ts_collected)

        if self._pending_iter is not None:
            # flush the last pipelined iteration so every dispatched
            # step's report/callback lands before learn() returns
            self._finalize_iteration(self._pending_iter)
            self._pending_iter = None
        self._last_finalize_t = None

        total = total_timer.elapsed()
        if total > 0:
            print(f"Learner: {self.total_timesteps - start_ts:,} timesteps "
                  f"in {total:.1f}s "
                  f"({(self.total_timesteps - start_ts) / total:,.0f} sps)")
        return self

    def profile_iterations(self, n: int, logdir: str):
        """Capture a jax.profiler trace of `n` training iterations
        (SURVEY §5.1: the reference only has wall-clock timers; on TPU the
        profiler shows per-op device time, HBM traffic and fusion). View
        with TensorBoard or xprof."""
        import jax.profiler
        with jax.profiler.trace(logdir):
            self.learn(iterations=n)
        print(f"Learner: wrote profiler trace for {n} iterations to "
              f"{logdir}")

    def display_report(self, report: Report):
        print(report.display(REPORT_ORDER))

    def update_learning_rates(self, policy_lr=None, critic_lr=None):
        """Learner::UpdateLearningRates (Learner.cpp:705-707)."""
        policy_lr = self.config.ppo.policy_lr if policy_lr is None \
            else policy_lr
        critic_lr = self.config.ppo.critic_lr if critic_lr is None \
            else critic_lr
        self.train_state = self.ppo.update_learning_rates(
            self.train_state, policy_lr, critic_lr)
        print(f"Learner: Updated learning rates to {policy_lr:.1e}, "
              f"{critic_lr:.1e}")

    def get_all_game_metrics(self):
        """Learner::GetAllGameMetrics analog: the last iteration's
        collector metrics (per-iteration aggregates rather than the
        reference's per-game Report list — lockstep envs aggregate on
        device). MultiGym runs additionally report a per-group breakdown
        under "groups": {mode_name: {metric: value}} — the on-device
        analog of mining the per-game Report list (Learner.cpp:709-721)
        for heterogeneous setups."""
        return dict(self._last_game_metrics or {})
