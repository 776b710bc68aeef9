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


class RolloutCollector:
    def __init__(self, gym, policy, deterministic=False):
        self.gym = gym
        self.policy = policy
        self.deterministic = deterministic

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

        def body(carry, _):
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
            return (gym_state, next_obs, key), out

        (gym_state, last_obs, _), traj = jax.lax.scan(
            body, (gym_state, obs, key), None, length=num_steps)

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
