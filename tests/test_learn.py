"""Learner math vs hand computations (GAE/Welford/buffer) and an
end-to-end smoke iteration (SURVEY.md §4 test plan items b, d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.ops.gae import compute_gae
from rlgymppo_cpp_tpu.ops.welford import (
    welford_init, welford_update_batch, welford_mean, welford_std,
)
from rlgymppo_cpp_tpu.learn.experience_buffer import ExperienceBuffer


def reference_gae(rews, dones, truncs, values, gamma, lam, ret_std, clip):
    """Literal transcription of TorchFuncs::ComputeGAE (TorchFuncs.cpp:5-52)
    in numpy, as the oracle."""
    next_values = values[1:]
    n = len(rews)
    ret_scale = 1.0 / ret_std if ret_std != 0 else 0.0
    adv = np.zeros(n)
    returns = np.zeros(n)
    last_gae = 0.0
    last_ret = 0.0
    for t in reversed(range(n)):
        done = 1.0 - dones[t]
        trunc = 1.0 - truncs[t]
        if ret_std != 0:
            nr = rews[t] * ret_scale
            if clip > 0:
                nr = np.clip(nr, -clip, clip)
        else:
            nr = rews[t]
        pred_ret = nr + gamma * next_values[t] * done
        delta = pred_ret - values[t]
        ret = rews[t] + last_ret * gamma * done * trunc
        returns[t] = ret
        last_ret = ret
        last_gae = delta + gamma * lam * done * trunc * last_gae
        adv[t] = last_gae
    targets = values[:-1] + adv
    return adv, targets, returns


@pytest.mark.parametrize("ret_std,clip", [(1.0, 10.0), (3.7, 10.0),
                                          (2.0, 0.5), (0.0, 10.0)])
def test_gae_matches_reference(ret_std, clip):
    rng = np.random.default_rng(0)
    T = 40
    rews = rng.normal(size=T).astype(np.float32) * 3
    dones = (rng.random(T) < 0.1).astype(np.float32)
    truncs = np.zeros(T, np.float32)
    truncs[-1] = 1.0 - dones[-1]
    values = rng.normal(size=T + 1).astype(np.float32)

    adv_ref, tgt_ref, ret_ref = reference_gae(
        rews, dones, truncs, values, 0.99, 0.95, ret_std, clip)

    adv, tgt, ret = compute_gae(
        jnp.asarray(rews)[:, None], jnp.asarray(dones)[:, None],
        jnp.asarray(truncs)[:, None], jnp.asarray(values)[:, None],
        0.99, 0.95, jnp.float32(ret_std), clip)

    np.testing.assert_allclose(np.asarray(adv)[:, 0], adv_ref, rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(tgt)[:, 0], tgt_ref, rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ret)[:, 0], ret_ref, rtol=2e-4,
                               atol=1e-4)


def test_welford_matches_numpy():
    rng = np.random.default_rng(1)
    xs = rng.normal(loc=5.0, scale=2.5, size=1000).astype(np.float32)
    st = welford_init(1)
    for chunk in np.split(xs, 10):
        st = welford_update_batch(st, jnp.asarray(chunk)[:, None])
    assert float(welford_mean(st)[0]) == pytest.approx(xs.mean(), abs=1e-2)
    assert float(welford_std(st)[0]) == pytest.approx(xs.std(ddof=1),
                                                      abs=1e-2)


def test_welford_initial_guards():
    st = welford_init(1)
    assert float(welford_std(st)[0]) == 1.0
    assert float(welford_mean(st)[0]) == 0.0


def test_experience_buffer_fifo():
    buf = ExperienceBuffer(10, 2)

    def batch(lo, hi):
        n = hi - lo
        vals = jnp.arange(lo, hi, dtype=jnp.float32)
        return {
            "states": jnp.stack([vals, vals], axis=-1),
            "actions": jnp.arange(lo, hi, dtype=jnp.int32),
            "log_probs": vals, "values": vals, "advantages": vals,
        }

    buf.submit_experience(batch(0, 4))
    assert buf.cur_size == 4
    np.testing.assert_array_equal(
        np.asarray(buf.data["actions"][:4]), [0, 1, 2, 3])

    buf.submit_experience(batch(4, 8))
    assert buf.cur_size == 8

    # Overflow: drop oldest (shift semantics, ExperienceBuffer.cpp:59-69)
    buf.submit_experience(batch(8, 14))
    assert buf.cur_size == 10
    np.testing.assert_array_equal(
        np.asarray(buf.data["actions"]), np.arange(4, 14))

    # Oversized submit keeps the newest rows (:37-41)
    buf.submit_experience(batch(0, 25))
    np.testing.assert_array_equal(
        np.asarray(buf.data["actions"]), np.arange(15, 25))

    idx = buf.get_shuffled_batch_indices(jax.random.PRNGKey(0), 5)
    assert idx.shape == (2, 5)
    assert sorted(np.asarray(idx).flatten().tolist()) == list(range(10))


@pytest.mark.slow   # full learner compile (~3 min cold on CPU)
def test_end_to_end_learning_iteration(tmp_path):
    """Full data path: rollout -> GAE -> buffer -> PPO -> checkpoint."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, FaceBallReward, NoTouchCondition,
        GoalScoreCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0),
                                  (FaceBallReward(), 0.25)]),
        terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    gym = Gym(match, num_envs=8, tick_skip=8)
    assert gym.obs_size == 70  # 9 + 8 + 34 + 19 for 1v0
    assert gym.action_amount == 90

    cfg = LearnerConfig(
        num_envs=8,
        timesteps_per_iteration=128,
        exp_buffer_size=256,
        ppo=PPOLearnerConfig(
            batch_size=128, mini_batch_size=64, epochs=2,
            policy_layer_sizes=(32, 32), critic_layer_sizes=(32, 32)),
        checkpoint_save_folder=str(tmp_path / "ckpt"),
        checkpoint_load_folder=None,
        timesteps_per_save=128,
        standardize_returns=True,
    )
    learner = Learner(gym, cfg)
    learner.learn(iterations=2)
    assert learner.total_timesteps == 2 * 128
    assert learner.ppo.cumulative_model_updates > 0

    # Save + reload round trip
    learner.save()
    cfg2 = LearnerConfig(**{**cfg.__dict__,
                            "checkpoint_load_folder": str(tmp_path / "ckpt")})
    learner2 = Learner(gym, cfg2)
    assert learner2.total_timesteps == learner.total_timesteps
    p1 = jax.tree.leaves(learner.train_state["policy"])
    p2 = jax.tree.leaves(learner2.train_state["policy"])
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fused_learner_path(tmp_path):
    """When buffer == batch == one iteration window (reference-default
    economics, examplemain.cpp:115-124), Learner.learn must take the fused
    single-program train step and produce a full report."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, FaceBallReward, NoTouchCondition,
        GoalScoreCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0),
                                  (FaceBallReward(), 0.25)]),
        terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    gym = Gym(match, num_envs=8, tick_skip=8)
    # horizon 16 -> window = 16 * 8 * 1 = 128 player-steps
    cfg = LearnerConfig(
        num_envs=8,
        timesteps_per_iteration=128,
        exp_buffer_size=128,
        ppo=PPOLearnerConfig(
            batch_size=128, mini_batch_size=0, epochs=2,
            policy_layer_sizes=(32, 32), critic_layer_sizes=(32, 32)),
        checkpoint_save_folder=str(tmp_path / "ckpt"),
        checkpoint_load_folder=None,
        timesteps_per_save=10_000,
        send_metrics=False,
    )
    learner = Learner(gym, cfg)
    assert learner._fused_eligible

    reports = []
    learner.iteration_callback = lambda lrn, rep: reports.append(rep)
    p_before = jax.tree.leaves(learner.train_state["policy"])
    p_before = [np.asarray(x).copy() for x in p_before]
    learner.learn(iterations=2)

    assert learner.total_timesteps == 2 * 128
    assert learner.ppo.cumulative_model_updates == 2 * 2
    assert len(reports) == 2
    for rep in reports:
        for k in ("Policy Entropy", "Mean KL Divergence",
                  "Value Function Loss", "Overall Steps/Second",
                  "Average Step Reward", "Policy Update Magnitude"):
            assert k in rep, k
            assert np.isfinite(rep[k]), (k, rep[k])
    p_after = jax.tree.leaves(learner.train_state["policy"])
    assert any(not np.allclose(a, b)
               for a, b in zip(p_before, p_after))


def test_async_report_pipeline_equivalence(tmp_path):
    """async_report pipelines the metrics fetch behind the next dispatched
    step; it must not change WHAT is reported — same per-iteration metric
    sequence, same callback count, and the callback must still observe the
    iteration's own cumulative timestep count."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, FaceBallReward, NoTouchCondition,
        GoalScoreCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    def make_match():
        return Match(
            reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0),
                                      (FaceBallReward(), 0.25)]),
            terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
            obs_builder=DefaultOBS(),
            action_parser=DiscreteAction(),
            state_setter=RandomState(True, True, True),
            team_size=1, spawn_opponents=False,
        )

    def run(async_report):
        gym = Gym(make_match(), num_envs=8, tick_skip=8)
        cfg = LearnerConfig(
            num_envs=8, timesteps_per_iteration=128, exp_buffer_size=128,
            random_seed=7,
            ppo=PPOLearnerConfig(
                batch_size=128, mini_batch_size=0, epochs=1,
                policy_layer_sizes=(32, 32), critic_layer_sizes=(32, 32)),
            checkpoint_save_folder=None, checkpoint_load_folder=None,
            send_metrics=False,
        )
        cfg.async_report = async_report
        learner = Learner(gym, cfg)
        assert learner._fused_eligible
        seen = []
        learner.iteration_callback = lambda lrn, rep: seen.append(
            (lrn.total_timesteps, dict(rep)))
        learner.learn(iterations=3)
        return learner, seen

    lrn_sync, sync_seen = run(False)
    lrn_async, async_seen = run(True)

    assert len(sync_seen) == len(async_seen) == 3
    # the callback must see each iteration's own cumulative count even
    # though (async) the next step is already dispatched when it runs
    assert [ts for ts, _ in async_seen] == [128, 256, 384]
    assert [ts for ts, _ in sync_seen] == [128, 256, 384]
    # after learn() returns, the live counter is the full total again
    assert lrn_async.total_timesteps == 384
    for (_, a), (_, b) in zip(sync_seen, async_seen):
        for k in ("Average Step Reward", "Policy Entropy",
                  "Mean KL Divergence", "Value Function Loss",
                  "Cumulative Timesteps"):
            assert np.isclose(a[k], b[k], rtol=1e-5, atol=1e-7), (
                k, a[k], b[k])


def test_fused_ineligible_configs(capsys):
    """A buffer that is NOT an integer multiple of the batch cannot run
    fused (the on-device window carries whole batches only); an integer
    multiple (examplemain.cpp:119 uses 3x) fuses with the window carried
    on device. Every ineligibility cause must be WARNED about with its
    reason — dropping off the fused path is a silent multi-x throughput
    cliff otherwise (VERDICT r4 item 7)."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0)]),
        terminal_conditions=[NoTouchCondition(50)],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    gym = Gym(match, num_envs=8, tick_skip=8)

    def make_cfg(buf):
        return LearnerConfig(
            num_envs=8, timesteps_per_iteration=128, exp_buffer_size=buf,
            ppo=PPOLearnerConfig(batch_size=128, mini_batch_size=64,
                                 epochs=1, policy_layer_sizes=(32,),
                                 critic_layer_sizes=(32,)),
            checkpoint_load_folder=None, send_metrics=False,
        )

    # non-integer window: warned with the K reason
    lrn = Learner(gym, make_cfg(300))
    assert not lrn._fused_eligible
    assert any("integer multiple" in r
               for r in lrn._fused_ineligible_reasons)
    out = capsys.readouterr().out
    assert "WARNING config is not eligible for the fused" in out
    assert "integer multiple" in out

    learner = Learner(gym, make_cfg(256))
    assert learner._fused_eligible and learner._fused_K == 2
    assert "WARNING config is not eligible" not in capsys.readouterr().out

    # K > 8: unrolled batch passes would blow up the compiled program
    lrn = Learner(gym, make_cfg(128 * 10))
    assert not lrn._fused_eligible
    out = capsys.readouterr().out
    assert "exceeds the fused path's limit of 8" in out

    # ts/iter != batch_size
    cfg = make_cfg(256)
    cfg.timesteps_per_iteration = 64
    lrn = Learner(gym, cfg)
    assert not lrn._fused_eligible
    assert "!= \nbatch_size" not in capsys.readouterr().out  # sanity
    assert any("batch_size" in r for r in lrn._fused_ineligible_reasons)

    # measure_gradient_noise
    cfg = make_cfg(256)
    cfg.ppo.measure_gradient_noise = True
    lrn = Learner(gym, cfg)
    assert not lrn._fused_eligible
    assert "measure_gradient_noise" in capsys.readouterr().out

    # multiple gym groups
    lrn = Learner([gym, gym], make_cfg(256))
    assert not lrn._fused_eligible
    assert "gym groups" in capsys.readouterr().out


@pytest.mark.slow
def test_fused_buffered_window_learns():
    """K=3 window economics through the fused path: the first K-1
    iterations warm up eagerly (partial-buffer batches, reference
    ExperienceBuffer semantics), then the fused program carries the
    window and runs K optimizer steps per iteration — KL becomes nonzero
    from the 2nd batch on (PPOLearner.cpp:183-198 dynamics)."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    match = Match(
        reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0)]),
        terminal_conditions=[NoTouchCondition(50)],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )
    gym = Gym(match, num_envs=8, tick_skip=8)
    cfg = LearnerConfig(
        num_envs=8, timesteps_per_iteration=128, exp_buffer_size=384,
        ppo=PPOLearnerConfig(batch_size=128, mini_batch_size=64, epochs=1,
                             policy_layer_sizes=(32,),
                             critic_layer_sizes=(32,)),
        checkpoint_load_folder=None, send_metrics=False,
    )
    learner = Learner(gym, cfg)
    assert learner._fused_eligible and learner._fused_K == 3

    kls = []
    updates_before = []
    learner.iteration_callback = lambda lrn, rep: (
        kls.append(rep["Mean KL Divergence"]),
        updates_before.append(rep["Cumulative Model Updates"]))
    learner.learn(iterations=5)

    # warmup: 1 + 2 eager batch updates; fused: 3 per iteration after
    assert updates_before == [1, 3, 6, 9, 12]
    assert learner._fused_buffer is not None and \
        learner._fused_buffer["states"].shape[0] == 3 * 128
    # multi-batch steps make the reported KL nonzero (later batches are
    # evaluated after earlier optimizer steps moved the params)
    assert any(abs(k) > 0 for k in kls[2:])


@pytest.mark.slow
def test_deterministic_resume_ring_window(tmp_path):
    """K=3 window economics: the fused ring buffer (slot pointer + K
    carried batches) must persist through save/load so a resumed run is
    bit-identical to an uninterrupted one."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, \
        PPOLearnerConfig

    def make_gym():
        match = Match(
            reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0)]),
            terminal_conditions=[NoTouchCondition(50)],
            obs_builder=DefaultOBS(),
            action_parser=DiscreteAction(),
            state_setter=RandomState(True, True, True),
            team_size=1, spawn_opponents=False,
        )
        return Gym(match, num_envs=4, tick_skip=8)

    def make_cfg(load):
        return LearnerConfig(
            num_envs=4, timesteps_per_iteration=32, exp_buffer_size=96,
            ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0,
                                 epochs=1, policy_layer_sizes=(16,),
                                 critic_layer_sizes=(16,)),
            checkpoint_save_folder=str(tmp_path / "ckpt"),
            checkpoint_load_folder=str(tmp_path / "ckpt") if load else None,
            timesteps_per_save=10**9, send_metrics=False,
            save_buffers=True,
        )

    gym = make_gym()
    a = Learner(gym, make_cfg(False))
    assert a._fused_K == 3
    a.learn(iterations=4)     # 2 eager warmups + 2 fused (ring active)
    assert a._fused_buffer is not None and \
        int(a._fused_buffer["slot"]) == (3 + 1) % 3
    a.save()
    a.learn(iterations=2)

    b = Learner(gym, make_cfg(True))
    assert b._fused_buffer is not None, "ring window must load"
    assert int(b._fused_buffer["slot"]) == int((3 + 1) % 3)
    b.learn(iterations=2)

    assert b.total_timesteps == a.total_timesteps
    for x, y in zip(jax.tree.leaves(a.train_state),
                    jax.tree.leaves(b.train_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_deterministic_resume(tmp_path):
    """save -> load -> N iterations == uninterrupted run (SURVEY §5.3):
    PRNG key, env state, return stats and buffer all persist."""
    from rlgymppo_cpp_tpu.gym import (
        Gym, Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, GoalScoreCondition,
        RandomState,
    )
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    def make_gym():
        match = Match(
            reward_fn=CombinedReward([(VelocityPlayerToBallReward(), 1.0)]),
            terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
            obs_builder=DefaultOBS(),
            action_parser=DiscreteAction(),
            state_setter=RandomState(True, True, True),
            team_size=1, spawn_opponents=False,
        )
        return Gym(match, num_envs=4, tick_skip=8)

    def make_cfg(load):
        return LearnerConfig(
            num_envs=4, timesteps_per_iteration=32, exp_buffer_size=32,
            ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                                 policy_layer_sizes=(16,),
                                 critic_layer_sizes=(16,)),
            checkpoint_save_folder=str(tmp_path / "ckpt"),
            checkpoint_load_folder=str(tmp_path / "ckpt") if load else None,
            timesteps_per_save=10**9, send_metrics=False,
            save_buffers=True,    # bit-exact resume needs the windows
        )

    gym = make_gym()
    # Uninterrupted: 4 iterations
    a = Learner(gym, make_cfg(False))
    a.learn(iterations=2)
    a.save()                      # snapshot mid-run
    a.learn(iterations=2)

    # Resumed: load the snapshot, 2 more iterations
    b = Learner(gym, make_cfg(True))
    assert b.total_timesteps == 2 * 32
    b.learn(iterations=2)

    assert b.total_timesteps == a.total_timesteps
    for x, y in zip(jax.tree.leaves(a.train_state["policy"]),
                    jax.tree.leaves(b.train_state["policy"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree.leaves(a.train_state["value"]),
                    jax.tree.leaves(b.train_state["value"])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _tiny_match(reward_fn=None):
    from rlgymppo_cpp_tpu.gym import (
        Match, DiscreteAction, DefaultOBS, CombinedReward,
        VelocityPlayerToBallReward, NoTouchCondition, GoalScoreCondition,
        RandomState,
    )
    return Match(
        reward_fn=reward_fn or CombinedReward(
            [(VelocityPlayerToBallReward(), 1.0)]),
        terminal_conditions=[NoTouchCondition(50), GoalScoreCondition()],
        obs_builder=DefaultOBS(),
        action_parser=DiscreteAction(),
        state_setter=RandomState(True, True, True),
        team_size=1, spawn_opponents=False,
    )


@pytest.mark.slow
def test_paranoid_mode_clean_run(tmp_path):
    """RG_PARANOID_MODE analog: debug counter + finite checks pass on a
    healthy run (Framework.h:30-34, ExperienceBuffer.cpp:72-88)."""
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    gym = Gym(_tiny_match(), num_envs=4, tick_skip=8)
    cfg = LearnerConfig(
        num_envs=4, timesteps_per_iteration=32, exp_buffer_size=32,
        ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                             policy_layer_sizes=(16,),
                             critic_layer_sizes=(16,)),
        checkpoint_load_folder=None, checkpoint_save_folder=None,
        send_metrics=False, paranoid=True,
    )
    learner = Learner(gym, cfg)
    learner.learn(iterations=2)
    assert learner.total_timesteps == 64


@pytest.mark.slow
def test_paranoid_mode_catches_nan(tmp_path):
    """A poisoned reward (NaN) must fail fast like RG_ERR_CLOSE."""
    import pytest as _pytest
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.gym.rewards import RewardFunction
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    class NaNReward(RewardFunction):
        def compute(self, gs, prev_actions, final, carry):
            r = jnp.full(gs.car_pos.shape[:-1], jnp.nan, jnp.float32)
            return r, carry

    gym = Gym(_tiny_match(NaNReward()), num_envs=4, tick_skip=8)
    cfg = LearnerConfig(
        num_envs=4, timesteps_per_iteration=32, exp_buffer_size=32,
        ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                             policy_layer_sizes=(16,),
                             critic_layer_sizes=(16,)),
        checkpoint_load_folder=None, checkpoint_save_folder=None,
        send_metrics=False, paranoid=True,
    )
    learner = Learner(gym, cfg)
    with _pytest.raises(RuntimeError, match="PARANOID"):
        learner.learn(iterations=1)


@pytest.mark.slow
def test_profiler_trace(tmp_path):
    """Learner.profile_iterations writes a jax.profiler trace
    (SURVEY §5.1 tracing beyond wall-clock timers)."""
    import os
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    gym = Gym(_tiny_match(), num_envs=4, tick_skip=8)
    cfg = LearnerConfig(
        num_envs=4, timesteps_per_iteration=32, exp_buffer_size=32,
        ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                             policy_layer_sizes=(16,),
                             critic_layer_sizes=(16,)),
        checkpoint_load_folder=None, checkpoint_save_folder=None,
        send_metrics=False,
    )
    learner = Learner(gym, cfg)
    logdir = str(tmp_path / "trace")
    learner.profile_iterations(1, logdir)
    found = []
    for root, _dirs, files in os.walk(logdir):
        found += files
    assert found, "no profiler trace files written"


def test_render_mode_override(tmp_path, capsys):
    """Render mode forces the reference's config override (Learner.cpp:
    38-51): one env, no metrics, no checkpoint folder."""
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    gym = Gym(_tiny_match(), num_envs=64, tick_skip=8)
    cfg = LearnerConfig(
        num_envs=64, timesteps_per_iteration=32, exp_buffer_size=32,
        ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                             policy_layer_sizes=(16,),
                             critic_layer_sizes=(16,)),
        checkpoint_load_folder=None,
        checkpoint_save_folder=str(tmp_path / "ckpt"),
        send_metrics=False, render_mode=True,
    )
    learner = Learner(gym, cfg)
    assert learner.gym.num_envs == 1
    assert learner.gym.match is gym.match
    assert learner.config.send_metrics is False
    assert not learner.config.checkpoint_save_folder
    # render_during_training suppresses the override (LearnerConfig.h:27)
    gym2 = Gym(_tiny_match(), num_envs=8, tick_skip=8)
    cfg2 = LearnerConfig(
        num_envs=8, timesteps_per_iteration=32, exp_buffer_size=32,
        ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                             policy_layer_sizes=(16,),
                             critic_layer_sizes=(16,)),
        checkpoint_load_folder=None, send_metrics=False,
        render_mode=True, render_during_training=True,
    )
    learner2 = Learner(gym2, cfg2)
    assert learner2.gym.num_envs == 8


def test_grad_noise_fused_warning(capsys):
    """measure_gradient_noise silently knocked runs off the fused path
    (VERDICT r2 weak #8); now it must warn."""
    from rlgymppo_cpp_tpu.gym import Gym
    from rlgymppo_cpp_tpu.learn import Learner, LearnerConfig, PPOLearnerConfig

    gym = Gym(_tiny_match(), num_envs=4, tick_skip=8)

    def make(noise):
        return LearnerConfig(
            num_envs=4, timesteps_per_iteration=32, exp_buffer_size=32,
            ppo=PPOLearnerConfig(batch_size=32, mini_batch_size=0, epochs=1,
                                 policy_layer_sizes=(16,),
                                 critic_layer_sizes=(16,),
                                 measure_gradient_noise=noise),
            checkpoint_load_folder=None, send_metrics=False,
        )

    learner = Learner(gym, make(True))
    out = capsys.readouterr().out
    assert not learner._fused_eligible
    assert "measure_gradient_noise" in out and "WARNING" in out

    learner2 = Learner(gym, make(False))
    out2 = capsys.readouterr().out
    assert learner2._fused_eligible
    assert "WARNING" not in out2
