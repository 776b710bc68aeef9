"""Generalized Advantage Estimation as a reversed lax.scan.

Bit-matches the reference's TorchFuncs::ComputeGAE
(src/private/RLGymPPO_CPP/Util/TorchFuncs.cpp:5-52) including its quirks:
the TD error uses return-std-normalized + clipped rewards while the returns
stream (fed back into the running std) uses raw rewards, and both the done
and truncated masks cut credit across boundaries.

Inputs are time-major [T, B] so the scan walks the time axis; B is the
flattened (env x player) batch, which keeps a possible future sequence-axis
sharding open (SURVEY.md §5.7).
"""

import jax
import jax.numpy as jnp


def compute_gae(rewards, dones, truncateds, values, gamma, lam,
                return_std=1.0, clip_range=10.0):
    """rewards/dones/truncateds: [T, B]; values: [T+1, B].

    Returns (advantages [T, B], value_targets [T, B], returns [T, B]).
    """
    return_scale = jnp.where(return_std != 0.0, 1.0 / return_std, 0.0)
    return_scale = jnp.where(jnp.isnan(return_scale), 0.0, return_scale)

    next_values = values[1:]
    cur_values = values[:-1]

    norm_rew = rewards * return_scale
    if clip_range > 0:
        norm_rew = jnp.clip(norm_rew, -clip_range, clip_range)
    norm_rew = jnp.where(return_std != 0.0, norm_rew, rewards)

    not_done = 1.0 - dones
    not_trunc = 1.0 - truncateds

    pred_ret = norm_rew + gamma * next_values * not_done
    delta = pred_ret - cur_values

    def scan_fn(carry, x):
        last_gae, last_ret = carry
        delta_t, rew_t, nd, nt = x
        ret = rew_t + last_ret * gamma * nd * nt
        gae = delta_t + gamma * lam * nd * nt * last_gae
        return (gae, ret), (gae, ret)

    B = rewards.shape[-1]
    init = (jnp.zeros(B, rewards.dtype), jnp.zeros(B, rewards.dtype))
    _, (adv, returns) = jax.lax.scan(
        scan_fn, init, (delta, rewards, not_done, not_trunc), reverse=True)

    value_targets = cur_values + adv
    return adv, value_targets, returns
