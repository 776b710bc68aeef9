"""Fused Pallas policy-forward kernel vs the differentiable jnp path.

The kernel (ops/pallas_mlp.py) must reproduce mlp_apply + temperature
softmax + min-prob clip (DiscretePolicy.cpp:44-50) exactly; on CPU it runs
in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.models.discrete_policy import (
    ACTION_MIN_PROB, DiscretePolicy)
from rlgymppo_cpp_tpu.ops.pallas_mlp import fused_mlp_probs, fused_mlp_sample


@pytest.fixture(scope="module")
def setup():
    policy = DiscretePolicy(89, 90, (256, 256, 256), use_pallas=False)
    params = policy.init(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(1), (1000, 89), jnp.float32)
    return policy, params, obs


def test_matches_jnp_path(setup):
    policy, params, obs = setup
    ref = policy.get_action_probs(params, obs)
    got = fused_mlp_probs(params, obs, min_prob=ACTION_MIN_PROB,
                          interpret=True)
    assert got.shape == (1000, 90)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)


def test_temperature_and_min_prob(setup):
    policy, params, obs = setup
    hot = DiscretePolicy(89, 90, (256, 256, 256), temperature=2.5,
                         use_pallas=False)
    ref = hot.get_action_probs(params, obs)
    got = fused_mlp_probs(params, obs, temperature=2.5,
                          min_prob=ACTION_MIN_PROB, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)
    assert float(jnp.min(got)) >= ACTION_MIN_PROB


def test_bf16_compute(setup):
    """bf16 weights/activations with f32 accumulation — same contract the
    jnp path offers via compute_dtype (PPOLearnerConfig.h:19-22)."""
    policy, params, obs = setup
    ref = DiscretePolicy(89, 90, (256, 256, 256),
                         compute_dtype=jnp.bfloat16,
                         use_pallas=False).get_action_probs(params, obs)
    got = fused_mlp_probs(params, obs, compute_dtype=jnp.bfloat16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-2)
    # rows still sum to ~1 (pad columns carry ~0 probability)
    np.testing.assert_allclose(np.asarray(jnp.sum(got, axis=-1)), 1.0,
                               atol=1e-2)


def test_bf16_params_imply_bf16_compute(setup):
    """The bf16_inference rollout hands a bf16 PARAM COPY with f32 obs
    (train_step.py:77-81). Both forward paths must then actually compute
    in bf16 — mixed f32xbf16 would silently promote back to f32 and the
    'half-precision inference' would be a no-op (the halfPrecModels
    analog, PPOLearner.cpp:41-53)."""
    from rlgymppo_cpp_tpu.models.mlp import mlp_apply

    policy, params, obs = setup
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), params)

    # jnp path: bf16 params must produce EXACTLY the explicit
    # compute_dtype=bf16 result, not the f32 one
    explicit = mlp_apply(params, obs, compute_dtype=jnp.bfloat16)
    implied = mlp_apply(params_bf16, obs)
    f32 = mlp_apply(params, obs)
    np.testing.assert_array_equal(np.asarray(implied),
                                  np.asarray(explicit))
    assert not np.allclose(np.asarray(implied), np.asarray(f32),
                           atol=1e-6)

    # kernel path: same rule
    got = fused_mlp_probs(params_bf16, obs, min_prob=ACTION_MIN_PROB,
                          interpret=True)
    want = fused_mlp_probs(params, obs, compute_dtype=jnp.bfloat16,
                           min_prob=ACTION_MIN_PROB, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-2)


def test_ragged_batch(setup):
    """Batch not a multiple of the tile: padded rows must not leak."""
    policy, params, obs = setup
    ref = policy.get_action_probs(params, obs[:37])
    got = fused_mlp_probs(params, obs[:37], min_prob=ACTION_MIN_PROB,
                          interpret=True)
    assert got.shape == (37, 90)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)


def test_sample_deterministic_matches_argmax(setup):
    """fused_mlp_sample(deterministic=True) must return the argmax of the
    probs kernel with zero log prob (DiscretePolicy.cpp:51-62)."""
    policy, params, obs = setup
    probs = fused_mlp_probs(params, obs, min_prob=ACTION_MIN_PROB,
                            interpret=True)
    act, lp = fused_mlp_sample(params, obs, jax.random.PRNGKey(3),
                               deterministic=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(act),
                                  np.asarray(jnp.argmax(probs, axis=-1)))
    np.testing.assert_array_equal(np.asarray(lp), 0.0)


def test_sample_log_prob_consistent(setup):
    """Whatever action the kernel draws, its reported log-prob must equal
    log(clip(softmax)) of the SAME forward at that action — the value the
    PPO ratio uses (importance weights corrupt silently otherwise)."""
    policy, params, obs = setup
    probs = np.asarray(fused_mlp_probs(
        params, obs, min_prob=ACTION_MIN_PROB, interpret=True))
    act, lp = fused_mlp_sample(params, obs, jax.random.PRNGKey(4),
                               min_prob=ACTION_MIN_PROB, interpret=True)
    act, lp = np.asarray(act), np.asarray(lp)
    assert act.shape == lp.shape == (1000,)
    assert (act >= 0).all() and (act < 90).all()
    want = np.log(probs[np.arange(1000), act])
    np.testing.assert_allclose(lp, want, atol=1e-5, rtol=1e-5)


def test_sample_distribution(setup):
    """Gumbel-max over the hardware PRNG must draw from the categorical
    the probs define: one obs row repeated N times, empirical frequencies
    vs probs in total-variation distance (a wrong distribution — e.g.
    biased bits or a missing log — trips this by a wide margin)."""
    policy, params, obs = setup
    N = 8192
    rep = jnp.tile(obs[:1], (N, 1))
    p = np.asarray(fused_mlp_probs(params, rep[:1], temperature=0.5,
                                   interpret=True))[0]
    act, _ = fused_mlp_sample(params, rep, jax.random.PRNGKey(5),
                              temperature=0.5, interpret=True)
    counts = np.bincount(np.asarray(act), minlength=90)[:90]
    tv = 0.5 * np.abs(counts / N - p).sum()
    # multinomial sampling noise at N=8192 over 90 bins gives TV ~ 0.04;
    # a uniform (broken) sampler against temperature-0.5 probs gives ~0.3+
    assert tv < 0.1, tv
    # independent keys draw different actions
    act2, _ = fused_mlp_sample(params, rep, jax.random.PRNGKey(6),
                               temperature=0.5, interpret=True)
    assert np.any(np.asarray(act) != np.asarray(act2))


def test_sample_ragged_and_bf16(setup):
    """Ragged batches pad cleanly; bf16 params imply bf16 compute and
    still report consistent log-probs."""
    policy, params, obs = setup
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    probs = np.asarray(fused_mlp_probs(
        params_bf16, obs[:37], min_prob=ACTION_MIN_PROB, interpret=True))
    act, lp = fused_mlp_sample(params_bf16, obs[:37],
                               jax.random.PRNGKey(7),
                               min_prob=ACTION_MIN_PROB, interpret=True)
    act, lp = np.asarray(act), np.asarray(lp)
    assert act.shape == (37,)
    want = np.log(probs[np.arange(37), act])
    np.testing.assert_allclose(lp, want, atol=1e-4, rtol=1e-4)


def test_auto_gate_prefers_jnp_off_tpu(setup):
    """On CPU the auto gate must keep the jnp path (no interpret-mode
    surprise in production code), and small batches always stay jnp."""
    policy, params, obs = setup
    auto = DiscretePolicy(89, 90, (256, 256, 256))
    assert jax.default_backend() != "tpu"  # conftest forces CPU
    ref = policy.get_action_probs(params, obs)
    got = auto.get_action_probs(params, obs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))
