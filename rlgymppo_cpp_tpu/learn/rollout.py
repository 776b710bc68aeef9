"""Experience collection: the jitted rollout scan.

Replaces the reference's ThreadAgentManager/ThreadAgent machinery
(src/private/RLGymPPO_CPP/Threading/*) — N threads x M games stepping under
mutexes — with one `lax.scan` over T steps of the whole env batch: policy
forward + gym step fused into a single compiled program, no host round trips
per step. Timesteps are counted in player-steps like the reference
(stepsCollected += numPlayers, ThreadAgent.cpp:158).

The last step of each collected window is marked truncated for envs whose
episode didn't end, mirroring ThreadAgentManager.cpp:50-58; GAE bootstraps
through truncations.
"""

import functools

import jax
import jax.numpy as jnp


class MultiGymCollector:
    """Collection over heterogeneous env groups (SURVEY.md §7 hard part 5).

    The reference's envCreateFn may build a different Match per env (team
    size, rewards...); lockstep vectorization wants homogeneity, so mixed
    setups become one Gym *per configuration group*, each stepped by its
    own jitted scan, with trajectories concatenated player-flattened. All
    groups must share obs_size (use DefaultOBSPadded for mixed team sizes)
    and action_amount.
    """

    def __init__(self, gyms, policy, deterministic=False,
                 step_metrics_fn=None):
        self.gyms = list(gyms)
        sizes = {g.obs_size for g in self.gyms}
        if len(sizes) != 1:
            raise ValueError(
                f"All env groups must share obs_size (got {sizes}); use "
                "DefaultOBSPadded for mixed team sizes")
        acts = {g.action_amount for g in self.gyms}
        if len(acts) != 1:
            raise ValueError(f"Mixed action amounts: {acts}")
        self.obs_size = sizes.pop()
        self.action_amount = acts.pop()
        self.players_per_step = sum(
            g.num_envs * g.num_players for g in self.gyms)
        self.collectors = [
            RolloutCollector(g, policy, deterministic,
                             step_metrics_fn=step_metrics_fn)
            for g in self.gyms]
        # Group labels for per-group metrics (GetAllGameMetrics,
        # Learner.cpp:709-721 returns per-game Reports; we report per
        # config GROUP — the finest granularity that exists on a lockstep
        # batch). Mode name per SkillTracker.cpp:19-25, suffixed when two
        # groups share a mode.
        names = []
        for g in self.gyms:
            m = g.match
            base = (f"{m.team_size}v{m.team_size}" if m.spawn_opponents
                    else f"{m.team_size}v0")
            name = base
            i = 1
            while name in names:
                name = f"{base}#{i}"
                i += 1
            names.append(name)
        self.group_names = names

    def reset(self, key):
        states, obs = [], []
        for g in self.gyms:
            key, sub = jax.random.split(key)
            s, o = g.reset(sub)
            states.append(s)
            obs.append(o)
        return states, obs

    def collect(self, params, gym_states, obs_list, key, num_steps):
        """-> (gym_states', obs_list', flat traj over all groups, metrics).

        Trajectories concatenate on the flattened player axis:
        obs [T, sum(B_g), O], rest [T, sum(B_g)].
        """
        new_states, new_obs, trajs, metrics = [], [], [], []
        for col, s, o in zip(self.collectors, gym_states, obs_list):
            key, sub = jax.random.split(key)
            s, o, traj, m = col.collect_flat(params, s, o, sub, num_steps)
            new_states.append(s)
            new_obs.append(o)
            trajs.append(traj)
            metrics.append(m)
        traj = {k: jnp.concatenate([t[k] for t in trajs], axis=1)
                for k in trajs[0]}
        avg = {
            "avg_step_reward": sum(m["avg_step_reward"] for m in metrics)
            / len(metrics),
            "avg_episode_reward": sum(
                m["avg_episode_reward"] for m in metrics) / len(metrics),
            "episodes_finished": sum(
                m["episodes_finished"] for m in metrics),
            # per-group breakdown, consumed by Learner.get_all_game_metrics
            "groups": {name: dict(m) for name, m
                       in zip(self.group_names, metrics)},
        }
        return new_states, new_obs, traj, avg


class RolloutCollector:
    def __init__(self, gym, policy, deterministic=False,
                 step_metrics_fn=None, paranoid=False):
        """`step_metrics_fn(game_state, rewards, done) -> dict[str, scalar]`
        is the batched analog of the reference's per-step callback
        (GameInst::Step stepCallback, GameInst.cpp:23-24): it runs inside
        the rollout scan each env-step and its outputs are averaged over
        the collected window into the collection metrics.

        `paranoid` is the RG_PARANOID_MODE analog (RLGymPPO_CPP
        Framework.h:30-34): a monotonically increasing debug counter is
        threaded through the trajectory (GameTrajectory.h:12-24) and
        finite-ness of obs/rewards/values is tracked per step, all
        validated at consume time. Zero cost when off (static flag)."""
        self.gym = gym
        self.policy = policy
        self.deterministic = deterministic
        self.step_metrics_fn = step_metrics_fn
        self.paranoid = paranoid

    @functools.partial(jax.jit, static_argnames=("self", "num_steps"))
    def collect(self, params, gym_state, obs, key, num_steps):
        """Collect `num_steps` env-steps for every env.

        Returns (gym_state', last_obs, traj dict, metrics). Trajectory
        arrays are time-major: obs [T, N, P, O], actions/log_probs [T, N, P],
        rewards [T, N, P], dones/truncateds [T, N].
        """
        N = self.gym.num_envs
        P = self.gym.num_players
        O = self.gym.obs_size

        def body(carry, step_idx):
            gym_state, obs, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            flat_obs = obs.reshape(N * P, O)
            action, log_prob = self.policy.get_action(
                params, flat_obs, k_act, deterministic=self.deterministic)
            action = action.reshape(N, P)
            log_prob = log_prob.reshape(N, P)
            gym_state, next_obs, rewards, done, info = self.gym.step(
                gym_state, action, k_step)
            out = {
                "obs": obs,
                "actions": action,
                "log_probs": log_prob,
                "rewards": rewards,
                "dones": done,
                # episode returns surface only at the step the episode ends
                "ep_reward": jnp.where(done[..., None],
                                       info["episode_reward"], 0.0),
                "ep_done": done,
            }
            if self.step_metrics_fn is not None:
                out["user_metrics"] = self.step_metrics_fn(
                    info["game_state"], rewards, done)
            if self.paranoid:
                out["debug_counter"] = step_idx
                out["finite"] = (jnp.all(jnp.isfinite(obs))
                                 & jnp.all(jnp.isfinite(rewards))
                                 & jnp.all(jnp.isfinite(log_prob)))
            return (gym_state, next_obs, key), out

        (gym_state, last_obs, _), traj = jax.lax.scan(
            body, (gym_state, obs, key),
            jnp.arange(num_steps, dtype=jnp.int32), length=num_steps)

        dones = traj["dones"]
        return self._finalize(gym_state, last_obs, traj, dones)

    def _finalize(self, gym_state, last_obs, traj, dones):
        P = self.gym.num_players
        truncateds = jnp.zeros_like(dones)
        truncateds = truncateds.at[-1].set(~dones[-1])
        traj["truncateds"] = truncateds

        ep_count = jnp.sum(traj["ep_done"])
        metrics = {
            "avg_step_reward": jnp.mean(traj["rewards"]),
            "avg_episode_reward": jnp.sum(traj["ep_reward"])
            / jnp.maximum(ep_count * P, 1),
            "episodes_finished": ep_count,
        }
        if "user_metrics" in traj:
            user = traj.pop("user_metrics")
            metrics.update({k: jnp.mean(v) for k, v in user.items()})
        if self.paranoid:
            # counter monotonicity + finite-ness, validated like
            # ExperienceBuffer's paranoid submit (ExperienceBuffer.cpp:72-88)
            counter = traj.pop("debug_counter")
            finite = traj.pop("finite")
            T = counter.shape[0]
            metrics["paranoid_ok"] = (
                jnp.all(counter == jnp.arange(T, dtype=jnp.int32))
                & jnp.all(finite)).astype(jnp.float32)
        return gym_state, last_obs, traj, metrics

    def collect_rendered(self, params, gym_state, obs, key, num_steps,
                         render_sender, time_scale=1.5):
        """Render-mode collection: one env step per host loop iteration,
        each state streamed to the render sender with real-time pacing
        (ThreadAgent.cpp:163-186; render config overrides Learner.cpp:38-51
        force this path with few envs)."""
        import time

        N, P, O = self.gym.num_envs, self.gym.num_players, self.gym.obs_size
        step_fn = self._render_step_jit
        frames = []
        sleep_time = self.gym.tick_skip / 120.0 / time_scale
        for _ in range(num_steps):
            key, sub = jax.random.split(key)
            (gym_state, next_obs), out = step_fn(params, gym_state, obs, sub)
            frames.append(out)
            render_sender.send(out.pop("game_state"),
                               out.pop("action_vecs"))
            obs = next_obs
            time.sleep(sleep_time)
        traj = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
        dones = traj["dones"]
        return self._finalize(gym_state, obs, traj, dones)

    def collect_flat(self, params, gym_state, obs, key, num_steps):
        """Like collect, but trajectory arrays come back player-flattened:
        obs [T, B, O], actions/log_probs/rewards/dones/truncateds [T, B]
        with B = N * P (dones broadcast per player)."""
        gym_state, last_obs, traj, metrics = self.collect(
            params, gym_state, obs, key, num_steps)
        T = traj["obs"].shape[0]
        N, P, O = traj["obs"].shape[1:]
        B = N * P
        flat = {
            "obs": traj["obs"].reshape(T, B, O),
            "actions": traj["actions"].reshape(T, B),
            "log_probs": traj["log_probs"].reshape(T, B),
            "rewards": traj["rewards"].reshape(T, B),
            "dones": jnp.broadcast_to(
                traj["dones"][:, :, None], (T, N, P)).reshape(T, B),
            "truncateds": jnp.broadcast_to(
                traj["truncateds"][:, :, None], (T, N, P)).reshape(T, B),
        }
        # last_obs stays [N, P, O] (it feeds the next collect call);
        # consumers flatten it themselves
        return gym_state, last_obs, flat, metrics

    @functools.cached_property
    def _render_step_jit(self):
        N, P, O = self.gym.num_envs, self.gym.num_players, self.gym.obs_size

        @jax.jit
        def one_step(params, gym_state, obs, key):
            k_act, k_step = jax.random.split(key)
            flat_obs = obs.reshape(N * P, O)
            action, log_prob = self.policy.get_action(
                params, flat_obs, k_act, deterministic=self.deterministic)
            action = action.reshape(N, P)
            gym_state2, next_obs, rewards, done, info = self.gym.step(
                gym_state, action, k_step)
            out = {
                "obs": obs,
                "actions": action,
                "log_probs": log_prob.reshape(N, P),
                "rewards": rewards,
                "dones": done,
                "ep_reward": jnp.where(done[..., None],
                                       info["episode_reward"], 0.0),
                "ep_done": done,
                "game_state": info["game_state"],
                "action_vecs": gym_state2.prev_actions,
            }
            return (gym_state2, next_obs), out

        return one_step
