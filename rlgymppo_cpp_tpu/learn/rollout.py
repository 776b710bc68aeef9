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
