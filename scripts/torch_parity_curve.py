"""Learning-parity artifact: JAX vs torch PPO on identical collected data.

Drives the real collection path (rollout scan on the 1v0 drive-to-ball
task), computes GAE once, and feeds the *same* batch each iteration to
(a) the JAX PPOLearner and (b) the torch reimplementation of the
reference's update (tests/test_torch_parity.py) starting from identical
weights. Records per-iteration losses/entropy/KL of both plus the
parameter drift between ecosystems -> docs_parity_r2.json.

This is the controlled version of the reference's "no differences in
learning" cross-check (/root/reference/README.md:29-30): same data, same
init, two ecosystems, overlapping curves.

Run: python scripts/torch_parity_curve.py [--iters 40]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rlgymppo_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", default="docs_parity_r2.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch
    torch.manual_seed(0)
    torch.set_num_threads(1)

    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, FaceBallReward, NoTouchCondition,
        GoalScoreCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn.config import (
        LearnerConfig, PPOLearnerConfig,
    )
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.rollout import RolloutCollector
    from rlgymppo_cpp_tpu.ops.gae import compute_gae
    from tests.test_torch_parity import (
        make_torch_nets, torch_train_batch, jax_params_flat,
        torch_params_flat,
    )

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0),
                                  (FaceBallReward(), 0.25)]),
        terminal_conditions=[NoTouchCondition(75), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    N, T = 32, 16
    gym = Gym(match, num_envs=N, tick_skip=8)
    cfg = LearnerConfig()
    ppo_cfg = PPOLearnerConfig(
        policy_layer_sizes=(64, 64), critic_layer_sizes=(64, 64),
        batch_size=N * T, mini_batch_size=0, epochs=1,
        policy_lr=3e-4, critic_lr=3e-4)
    ppo = PPOLearner(gym.obs_size, gym.action_amount, ppo_cfg)
    ts = ppo.init(jax.random.PRNGKey(7))
    policy_t, critic_t = make_torch_nets(ts, 1.0)
    opt_p = torch.optim.Adam(policy_t.parameters(), lr=ppo_cfg.policy_lr)
    opt_c = torch.optim.Adam(critic_t.parameters(), lr=ppo_cfg.critic_lr)

    collector = RolloutCollector(gym, ppo.policy)
    key = jax.random.PRNGKey(1)
    key, sub = jax.random.split(key)
    gym_state, obs = gym.reset(sub)

    rows = []
    for it in range(args.iters):
        key, sub = jax.random.split(key)
        gym_state, last_obs, traj, _m = collector.collect(
            ts["policy"], gym_state, obs, sub, T)
        obs = last_obs

        O = gym.obs_size
        obs_seq = jnp.concatenate(
            [traj["obs"].reshape(T, N, O), last_obs.reshape(1, N, O)], 0)
        values = ppo.value_net.forward(ts["value"], obs_seq)
        adv, vtarg, _ret = compute_gae(
            traj["rewards"].reshape(T, N).astype(jnp.float32),
            traj["dones"].astype(jnp.float32),
            traj["truncateds"].astype(jnp.float32),
            values, cfg.gae_gamma, cfg.gae_lambda,
            jnp.float32(1.0), cfg.reward_clip_range)

        batch_np = {
            "states": np.asarray(obs_seq[:-1].reshape(-1, O)),
            "actions": np.asarray(traj["actions"].reshape(-1), np.int32),
            "log_probs": np.asarray(traj["log_probs"].reshape(-1)),
            "advantages": np.asarray(adv.reshape(-1)),
            "values": np.asarray(vtarg.reshape(-1)),
        }
        jbatch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        ts, metrics = ppo._train_batch(ts, jbatch)
        tl_ppo, tl_val, tl_ent = torch_train_batch(
            policy_t, critic_t, opt_p, opt_c, batch_np, ppo_cfg)

        a = jax_params_flat(ts)
        b = torch_params_flat(policy_t, critic_t, None)
        rows.append({
            "iter": it,
            "jax_value_loss": float(metrics["value_loss"]),
            "jax_entropy": float(metrics["entropy"]),
            "jax_kl": float(metrics["kl"]),
            "torch_value_loss": tl_val,
            "torch_entropy": tl_ent,
            "param_max_abs_diff": float(np.abs(a - b).max()),
            "param_rel_drift": float(
                np.abs(a - b).max() / (np.abs(a).max() + 1e-9)),
        })
        print(json.dumps(rows[-1]))

    summary = {
        "task": "1v0 drive-to-ball, identical batches, identical init",
        "iters": args.iters,
        "batch": N * T,
        "final_param_max_abs_diff": rows[-1]["param_max_abs_diff"],
        "value_loss_corr": float(np.corrcoef(
            [r["jax_value_loss"] for r in rows],
            [r["torch_value_loss"] for r in rows])[0, 1]),
        "entropy_max_abs_diff": max(
            abs(r["jax_entropy"] - r["torch_entropy"]) for r in rows),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
