"""Parity of the fused Pallas PPO gradient kernel vs the jnp autodiff path.

The kernel (ops/pallas_ppo.py) must reproduce jax.grad of the exact
minibatch loss in ppo_learner.py:97-131 — same clipped-surrogate branch
selection, entropy bonus, value MSE, temperature softmax — plus the five
SB3 diagnostics. Runs in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy
from rlgymppo_cpp_tpu.models.value_estimator import ValueEstimator
from rlgymppo_cpp_tpu.ops.pallas_ppo import fused_ppo_grads

CLIP = 0.2
ENT = 0.01


def _make(obs_size=23, n_actions=11, layers=(32, 16), B=300,
          temperature=1.0, seed=0):
    key = jax.random.PRNGKey(seed)
    kp, kv, ko, ka, kl, kd, kt = jax.random.split(key, 7)
    policy = DiscretePolicy(obs_size, n_actions, layers,
                            temperature=temperature, use_pallas=False)
    value_net = ValueEstimator(obs_size, layers)
    pp = policy.init(kp)
    vp = value_net.init(kv)
    batch = {
        "states": jax.random.normal(ko, (B, obs_size), jnp.float32),
        "actions": jax.random.randint(ka, (B,), 0, n_actions),
        # old log-probs near the policy's own values, so ratios straddle
        # the clip boundary and both surrogate branches are exercised
        "log_probs": jnp.log(1.0 / n_actions)
        + 0.3 * jax.random.normal(kl, (B,)),
        "advantages": jax.random.normal(kd, (B,)),
        "values": jax.random.normal(kt, (B,)),
    }
    return policy, value_net, pp, vp, batch


def _ref_grads(policy, value_net, pp, vp, batch, temperature=1.0):
    """jax.grad of the exact loss in ppo_learner.minibatch_loss over the
    full batch (ratio_scale = 1)."""

    def loss(params):
        policy_params, value_params = params
        vals = value_net.forward(value_params, batch["states"])
        log_probs, entropy = policy.get_backprop_data(
            policy_params, batch["states"], batch["actions"])
        ratio = jnp.exp(log_probs - batch["log_probs"])
        clipped = jnp.clip(ratio, 1 - CLIP, 1 + CLIP)
        adv = batch["advantages"]
        policy_loss = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
        value_loss = jnp.mean((vals - batch["values"]) ** 2)
        log_ratio = log_probs - batch["log_probs"]
        metrics = {
            "entropy": entropy,
            "kl": jnp.mean((jnp.exp(log_ratio) - 1) - log_ratio),
            "ratio": jnp.mean(ratio),
            "value_loss": value_loss,
            "clip_fraction": jnp.mean(
                (jnp.abs(ratio - 1) > CLIP).astype(jnp.float32)),
        }
        return (policy_loss - entropy * ENT) + value_loss, metrics

    return jax.grad(loss, has_aux=True)((pp, vp))


def _assert_tree_close(a, b, rtol=2e-4, atol=2e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("temperature", [1.0, 1.3])
def test_grads_match_autodiff(temperature):
    policy, value_net, pp, vp, batch = _make(temperature=temperature)
    (gp_ref, gv_ref), m_ref = _ref_grads(policy, value_net, pp, vp, batch,
                                         temperature)
    (gp, gv), m = fused_ppo_grads(
        pp, vp, batch, clip_range=CLIP, ent_coef=ENT,
        temperature=temperature, tile_b=128, interpret=True)
    _assert_tree_close(gp, gp_ref)
    _assert_tree_close(gv, gv_ref)
    for k in m_ref:
        np.testing.assert_allclose(float(m[k]), float(m_ref[k]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"metric {k}")


def test_padded_rows_and_lanes():
    """B not a multiple of the tile, obs/action dims far from 128 — the
    padding must contribute exactly nothing."""
    policy, value_net, pp, vp, batch = _make(
        obs_size=7, n_actions=3, layers=(24,), B=77, seed=3)
    (gp_ref, gv_ref), m_ref = _ref_grads(policy, value_net, pp, vp, batch)
    (gp, gv), m = fused_ppo_grads(
        pp, vp, batch, clip_range=CLIP, ent_coef=ENT, tile_b=32,
        interpret=True)
    _assert_tree_close(gp, gp_ref)
    _assert_tree_close(gv, gv_ref)
    np.testing.assert_allclose(float(m["entropy"]),
                               float(m_ref["entropy"]), rtol=1e-4)


def test_extreme_advantages_clip_branches():
    """All-clipped and all-unclipped regimes both match (branch-selection
    gradient semantics of jnp.minimum)."""
    policy, value_net, pp, vp, batch = _make(seed=5)
    for shift in (-2.0, 0.0, 2.0):   # push ratios out of / into range
        b = dict(batch, log_probs=batch["log_probs"] + shift)
        (gp_ref, gv_ref), _ = _ref_grads(policy, value_net, pp, vp, b)
        (gp, gv), _ = fused_ppo_grads(
            pp, vp, b, clip_range=CLIP, ent_coef=ENT, tile_b=128,
            interpret=True)
        _assert_tree_close(gp, gp_ref)
        _assert_tree_close(gv, gv_ref)


def test_train_batch_kernel_path_matches_jnp():
    """PPOLearner._train_batch with the fused kernel forced (interpret on
    CPU) must produce the same optimizer update and metrics as the jnp
    minibatch-scan path."""
    from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner

    B, O, A = 256, 23, 11
    key = jax.random.PRNGKey(7)
    ko, ka, kl, kd, kt, ki = jax.random.split(key, 6)
    batch = {
        "states": jax.random.normal(ko, (B, O), jnp.float32),
        "actions": jax.random.randint(ka, (B,), 0, A),
        "log_probs": jnp.log(1.0 / A) + 0.3 * jax.random.normal(kl, (B,)),
        "advantages": jax.random.normal(kd, (B,)),
        "values": jax.random.normal(kt, (B,)),
    }

    def run(kernel_flag, mini):
        cfg = PPOLearnerConfig(
            policy_layer_sizes=(32, 16), critic_layer_sizes=(32, 16),
            batch_size=B, mini_batch_size=mini, epochs=1,
            fused_grad_kernel=kernel_flag)
        ppo = PPOLearner(O, A, cfg)
        ts = ppo.init(ki)
        return ppo._train_batch(ts, batch)

    ts_ref, m_ref = run(False, 64)   # minibatch accumulation path
    ts_k, m_k = run(True, 0)         # whole-batch fused kernel
    for x, y in zip(jax.tree.leaves(ts_ref["policy"]),
                    jax.tree.leaves(ts_k["policy"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)
    for x, y in zip(jax.tree.leaves(ts_ref["value"]),
                    jax.tree.leaves(ts_k["value"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)
    for k in ("entropy", "kl", "ratio", "value_loss", "clip_fraction"):
        np.testing.assert_allclose(float(m_k[k]), float(m_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_kernel_shard_map_matches_single_device():
    """On a multi-device mesh the kernel runs per shard under shard_map
    with a pmean over the env axis — the resulting update must equal the
    single-path jnp computation (8 virtual CPU devices, interpret mode)."""
    from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.parallel.mesh import (
        make_mesh, shard_env_tree, replicated,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")

    B, O, A = 256, 23, 11
    key = jax.random.PRNGKey(11)
    ko, ka, kl, kd, kt, ki = jax.random.split(key, 6)
    batch = {
        "states": jax.random.normal(ko, (B, O), jnp.float32),
        "actions": jax.random.randint(ka, (B,), 0, A),
        "log_probs": jnp.log(1.0 / A) + 0.3 * jax.random.normal(kl, (B,)),
        "advantages": jax.random.normal(kd, (B,)),
        "values": jax.random.normal(kt, (B,)),
    }

    def cfg(flag):
        return PPOLearnerConfig(
            policy_layer_sizes=(32, 16), critic_layer_sizes=(32, 16),
            batch_size=B, mini_batch_size=0, epochs=1,
            fused_grad_kernel=flag)

    mesh = make_mesh(model_parallel=1)
    ppo_k = PPOLearner(O, A, cfg(True), mesh=mesh)
    ts = ppo_k.init(ki)
    ts_sharded = jax.device_put(ts, replicated(mesh))
    batch_sharded = shard_env_tree(batch, mesh)
    ts_k, m_k = ppo_k._train_batch(ts_sharded, batch_sharded)

    ppo_ref = PPOLearner(O, A, cfg(False))
    ts_ref, m_ref = ppo_ref._train_batch(ppo_ref.init(ki), batch)

    for x, y in zip(jax.tree.leaves(ts_k["policy"]),
                    jax.tree.leaves(ts_ref["policy"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6)
    for k in ("entropy", "kl", "ratio", "value_loss", "clip_fraction"):
        np.testing.assert_allclose(float(m_k[k]), float(m_ref[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
