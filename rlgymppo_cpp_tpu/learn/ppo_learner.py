"""PPO optimization: clipped surrogate + entropy + value MSE.

Functional re-design of the reference's PPOLearner
(src/private/RLGymPPO_CPP/PPO/PPOLearner.cpp:29-349): per epoch the buffer
yields shuffled full batches; each batch is consumed as a lax.scan over
minibatches with gradient accumulation scaled by batchSizeRatio
(PPOLearner.cpp:127,171,178), then one clipped-global-norm(0.5) Adam step
per network. The reference's CPU thread-pool fan-out (:236-256) becomes the
minibatch scan; its CUDA autocast becomes native bf16 matmuls.

Reported metrics match :305-345: mean entropy, SB3 KL, mean ratio, value
loss, SB3 clip fraction, update magnitudes, cumulative updates.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
from rlgymppo_cpp_tpu.models.discrete_policy import DiscretePolicy
from rlgymppo_cpp_tpu.models.value_estimator import ValueEstimator
from rlgymppo_cpp_tpu.parallel.mesh import ENV_AXIS, MODEL_AXIS


def _global_norm(tree):
    return optax.global_norm(tree)


@jax.jit
def _params_vector_norm_diff(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    sq = sum(jnp.sum((x - y) ** 2) for x, y in zip(leaves_a, leaves_b))
    return jnp.sqrt(sq)


class PPOLearner:
    def __init__(self, obs_size: int, action_amount: int,
                 config: PPOLearnerConfig, sharding=None, mesh=None):
        self.config = config
        if config.mini_batch_size == 0:
            config.mini_batch_size = config.batch_size
        if config.batch_size % config.mini_batch_size != 0:
            raise ValueError("batch_size must be a multiple of mini_batch_size")

        compute_dtype = jnp.bfloat16 if config.bf16_learn else None
        # Decide the inference-kernel gate from the devices that will RUN
        # the math: on a mesh, its devices — the multichip dryrun builds
        # a virtual CPU mesh while the process's default backend stays
        # the TPU, and a pallas_call lowered for those CPU devices fails
        # ("only interpret mode supported"). Any MULTI-device mesh also
        # keeps the jnp inference path: pallas_call is opaque to the SPMD
        # partitioner, which would all-gather the env-sharded rollout
        # batch to run the kernel replicated (the gradient kernel gets an
        # explicit shard_map path below; inference sharding is already
        # clean on the jnp path's plain matmuls).
        if mesh is not None and (
                next(iter(mesh.devices.flat)).platform != "tpu"
                or int(mesh.devices.size) > 1):
            use_pallas = False
        else:
            use_pallas = "auto"
        self.policy = DiscretePolicy(
            obs_size, action_amount, config.policy_layer_sizes,
            temperature=config.policy_temperature,
            compute_dtype=compute_dtype, use_pallas=use_pallas)
        self.value_net = ValueEstimator(
            obs_size, config.critic_layer_sizes, compute_dtype=compute_dtype)

        # grad clip 0.5 then Adam, like clip_grad_norm_ + optimizer step
        self.policy_optimizer = optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.inject_hyperparams(optax.adam)(config.policy_lr))
        self.value_optimizer = optax.chain(
            optax.clip_by_global_norm(0.5),
            optax.inject_hyperparams(optax.adam)(config.critic_lr))

        self.cumulative_model_updates = 0
        self.sharding = sharding
        self.mesh = mesh     # device mesh for the shard_map kernel path

        self.grad_noise_tracker = None
        if config.measure_gradient_noise:
            from rlgymppo_cpp_tpu.utils.grad_noise import GradNoiseTracker
            self.grad_noise_tracker = GradNoiseTracker(
                config.batch_size, config.gradient_noise_update_interval,
                config.gradient_noise_avg_decay)

    def init(self, key):
        kp, kv = jax.random.split(key)
        policy_params = self.policy.init(kp)
        value_params = self.value_net.init(kv)
        return {
            "policy": policy_params,
            "value": value_params,
            "policy_opt": self.policy_optimizer.init(policy_params),
            "value_opt": self.value_optimizer.init(value_params),
        }

    # ------------------------------------------------------------ batch step

    @functools.partial(jax.jit, static_argnames=("self",))
    def _train_batch(self, train_state, batch):
        """One PPO batch: minibatch scan w/ grad accumulation, then one
        optimizer step per network."""
        cfg = self.config
        mbs = cfg.mini_batch_size
        n_mb = cfg.batch_size // mbs
        train_policy = cfg.policy_lr != 0
        train_critic = cfg.critic_lr != 0

        def minibatch_loss(params, mb):
            policy_params, value_params = params
            obs = mb["states"]
            acts = mb["actions"]
            old_probs = mb["log_probs"]
            advantages = mb["advantages"]
            target_values = mb["values"]
            ratio_scale = mbs / cfg.batch_size

            vals = self.value_net.forward(value_params, obs)
            log_probs, entropy = self.policy.get_backprop_data(
                policy_params, obs, acts)
            ratio = jnp.exp(log_probs - old_probs)
            clipped = jnp.clip(ratio, 1 - cfg.clip_range, 1 + cfg.clip_range)
            policy_loss = -jnp.mean(
                jnp.minimum(ratio * advantages, clipped * advantages))
            ppo_loss = (policy_loss - entropy * cfg.ent_coef) * ratio_scale
            value_loss = jnp.mean((vals - target_values) ** 2) * ratio_scale

            loss = jnp.where(train_policy, ppo_loss, 0.0) \
                + jnp.where(train_critic, value_loss, 0.0)

            # SB3 diagnostics (PPOLearner.cpp:183-198)
            log_ratio = log_probs - old_probs
            kl = jnp.mean((jnp.exp(log_ratio) - 1) - log_ratio)
            clip_frac = jnp.mean(
                (jnp.abs(ratio - 1) > cfg.clip_range).astype(jnp.float32))
            metrics = {
                "entropy": entropy,
                "kl": kl,
                "ratio": jnp.mean(ratio),
                "value_loss": value_loss / ratio_scale,
                "clip_fraction": clip_frac,
            }
            return loss, metrics

        # The minibatch scan is purely a memory-management device: grads
        # accumulate across ALL minibatches before the single optimizer
        # step, so the whole-batch fused kernel computes the identical
        # update in one pass (activations resident in VMEM instead of
        # round-tripping HBM; ops/pallas_ppo.py).
        #
        # Multi-chip: pallas_call is opaque to the SPMD partitioner (it
        # would all-gather a sharded batch to run it replicated), so on a
        # known mesh the kernel runs PER SHARD under shard_map — each
        # device computes its rows' gradient mean, then a pmean over the
        # env axis reproduces the global mean (equal shard sizes). TP
        # meshes (model axis > 1) keep the jnp path, which shards the
        # hidden dim cleanly; so does a multi-device run with no mesh
        # handle to shard_map over.
        # Decide from the devices that will actually RUN the math: on a
        # mesh, its devices (the multichip dryrun builds a virtual CPU
        # mesh while the process's default backend stays the TPU —
        # JAX_PLATFORMS does not reliably override the site-forced
        # platform); otherwise the process's default backend.
        mesh = self.mesh
        if mesh is not None:
            n_dev = int(mesh.devices.size)
            platform = next(iter(mesh.devices.flat)).platform
        else:
            n_dev = jax.device_count()
            platform = jax.default_backend()
        if cfg.fused_grad_kernel is True and cfg.bf16_learn:
            # The kernel computes in f32 only; honoring the force flag
            # would silently ignore the configured bf16 compute dtype.
            print("PPOLearner: WARNING fused_grad_kernel=True ignored "
                  "because bf16_learn is set (the fused kernel is "
                  "f32-only); using the jnp bf16 path")
        kernel_ok = (cfg.fused_grad_kernel is True
                     and not cfg.bf16_learn) or (
            cfg.fused_grad_kernel == "auto"
            and platform == "tpu"
            and not cfg.bf16_learn
            and cfg.batch_size >= 16384)
        multi_ok = (
            mesh is not None
            and mesh.shape.get(MODEL_AXIS, 1) == 1
            and cfg.batch_size % mesh.shape[ENV_AXIS] == 0)
        use_kernel = kernel_ok and (n_dev == 1 or multi_ok)
        # Trace-time record of which gradient path this program took —
        # read by the driver dryrun so MULTICHIP logs name the path
        # actually exercised (VERDICT r4 item 5)
        self.grad_path = (
            "pallas_kernel+shard_map" if use_kernel and n_dev > 1
            else "pallas_kernel" if use_kernel else "jnp_autodiff")
        if use_kernel:
            from rlgymppo_cpp_tpu.ops.pallas_ppo import fused_ppo_grads
            interpret = platform != "tpu"

            def kernel_grads(pp, vp, b):
                return fused_ppo_grads(
                    pp, vp, b, clip_range=cfg.clip_range,
                    ent_coef=cfg.ent_coef,
                    temperature=cfg.policy_temperature,
                    interpret=interpret)

            if n_dev == 1:
                grads, metrics = kernel_grads(
                    train_state["policy"], train_state["value"], batch)
            else:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                def per_shard(pp, vp, b):
                    out = kernel_grads(pp, vp, b)
                    return jax.tree.map(
                        lambda x: jax.lax.pmean(x, ENV_AXIS), out)

                grads, metrics = shard_map(
                    per_shard, mesh=mesh,
                    in_specs=(P(), P(), P(ENV_AXIS)),
                    out_specs=(P(), P()), check_vma=False)(
                    train_state["policy"], train_state["value"], batch)
        else:
            grad_fn = jax.grad(minibatch_loss, has_aux=True)

            def scan_body(carry, mb):
                grads_acc, metrics_acc = carry
                grads, metrics = grad_fn(
                    (train_state["policy"], train_state["value"]), mb)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
                return (grads_acc, metrics_acc), None

            zero_grads = jax.tree.map(
                jnp.zeros_like,
                (train_state["policy"], train_state["value"]))
            zero_metrics = {k: jnp.zeros(()) for k in
                            ("entropy", "kl", "ratio", "value_loss",
                             "clip_fraction")}
            minibatches = jax.tree.map(
                lambda x: x.reshape(n_mb, mbs, *x.shape[1:]), batch)
            (grads, metrics), _ = jax.lax.scan(
                scan_body, (zero_grads, zero_metrics), minibatches)
            metrics = jax.tree.map(lambda m: m / n_mb, metrics)

        policy_grads, value_grads = grads
        if cfg.measure_gradient_noise:
            metrics["policy_grad_flat"] = jnp.concatenate(
                [g.reshape(-1) for g in jax.tree.leaves(policy_grads)])
        new_state = dict(train_state)
        if train_policy:
            updates, new_state["policy_opt"] = self.policy_optimizer.update(
                policy_grads, train_state["policy_opt"],
                train_state["policy"])
            new_state["policy"] = optax.apply_updates(
                train_state["policy"], updates)
        if train_critic:
            updates, new_state["value_opt"] = self.value_optimizer.update(
                value_grads, train_state["value_opt"], train_state["value"])
            new_state["value"] = optax.apply_updates(
                train_state["value"], updates)
        return new_state, metrics

    # ----------------------------------------------------------------- learn

    @functools.partial(jax.jit,
                       static_argnames=("self", "start", "n_epochs"))
    def _learn_single_batch(self, train_state, data, start, n_epochs):
        """Full PPO phase for the one-batch-per-epoch case in a single
        program: batch slice + epochs of _train_batch + update magnitudes.
        One device dispatch instead of dozens (host->device call latency
        dominated the learn phase otherwise)."""
        cfg = self.config
        batch = {k: jax.lax.dynamic_slice_in_dim(
            data[k], start, cfg.batch_size, axis=0)
            for k in ("states", "actions", "log_probs", "values",
                      "advantages")}
        policy_before = train_state["policy"]
        critic_before = train_state["value"]

        def epoch_body(ts, _):
            ts, m = self._train_batch(ts, batch)
            return ts, m

        train_state, ms = jax.lax.scan(
            epoch_body, train_state, None, length=n_epochs)
        metrics = jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)
        # one stacked vector -> one device->host transfer for all metrics
        packed = jnp.stack([
            metrics["entropy"], metrics["kl"], metrics["ratio"],
            metrics["value_loss"], metrics["clip_fraction"],
            _params_vector_norm_diff(policy_before, train_state["policy"]),
            _params_vector_norm_diff(critic_before, train_state["value"]),
        ])
        return train_state, packed

    def learn(self, train_state, exp_buffer, key):
        """Full PPO phase over the experience buffer. Returns
        (train_state', report dict of floats)."""
        cfg = self.config
        policy_before = train_state["policy"]
        critic_before = train_state["value"]

        num_iterations = 0
        metrics_sum = None
        fields = ("states", "actions", "log_probs", "values", "advantages")
        n_batches = exp_buffer.cur_size // cfg.batch_size

        if n_batches == 1 and self.grad_noise_tracker is None:
            # fused fast path: one device dispatch for the whole phase
            train_state, packed = self._learn_single_batch(
                train_state, exp_buffer.data,
                exp_buffer.cur_size - cfg.batch_size, cfg.epochs)
            m = np.asarray(packed)
            self.cumulative_model_updates += cfg.epochs
            return train_state, {
                "Cumulative Model Updates": self.cumulative_model_updates,
                "Policy Entropy": float(m[0]),
                "Mean KL Divergence": float(m[1]),
                "Mean Ratio": float(m[2]),
                "Value Function Loss": float(m[3]),
                "SB3 Clip Fraction": float(m[4]),
                "Policy Update Magnitude": float(m[5]),
                "Value Function Update Magnitude": float(m[6]),
            }

        for epoch in range(cfg.epochs):
            if n_batches == 1:
                # One optimizer step per batch (PPOLearner.cpp:103-299) and
                # one batch per epoch: the row shuffle cannot change the
                # update (gradients sum over the whole batch before the
                # step), so skip it — random row gathers profiled as the
                # hottest kernel of the learn phase on TPU. The newest
                # batch_size rows are used when the buffer holds a
                # remainder.
                batches = [{k: jax.lax.dynamic_slice_in_dim(
                    exp_buffer.data[k],
                    exp_buffer.cur_size - cfg.batch_size, cfg.batch_size,
                    axis=0) for k in fields}]
            else:
                key, sub = jax.random.split(key)
                batch_indices = exp_buffer.get_shuffled_batch_indices(
                    sub, cfg.batch_size)
                batches = [
                    {k: exp_buffer.data[k][batch_indices[b]]
                     for k in fields}
                    for b in range(batch_indices.shape[0])]
            for batch in batches:
                train_state, metrics = self._train_batch(train_state, batch)
                num_iterations += 1
                grad_flat = metrics.pop("policy_grad_flat", None)
                if grad_flat is not None and self.grad_noise_tracker:
                    self.grad_noise_tracker.update(grad_flat)
                # accumulate on device; one host sync after the loop
                if metrics_sum is None:
                    metrics_sum = metrics
                else:
                    metrics_sum = jax.tree.map(jnp.add, metrics_sum,
                                               metrics)

        if metrics_sum is not None:
            metrics_sum = {k: float(v) for k, v in metrics_sum.items()}
        n = max(num_iterations, 1)
        self.cumulative_model_updates += num_iterations
        report = {
            "Cumulative Model Updates": self.cumulative_model_updates,
            "Policy Entropy": (metrics_sum or {}).get("entropy", 0.0) / n,
            "Mean KL Divergence": (metrics_sum or {}).get("kl", 0.0) / n,
            "Mean Ratio": (metrics_sum or {}).get("ratio", 0.0) / n,
            "Value Function Loss":
                (metrics_sum or {}).get("value_loss", 0.0) / n,
            "SB3 Clip Fraction":
                (metrics_sum or {}).get("clip_fraction", 0.0) / n,
            "Policy Update Magnitude": float(_params_vector_norm_diff(
                policy_before, train_state["policy"])),
            "Value Function Update Magnitude": float(_params_vector_norm_diff(
                critic_before, train_state["value"])),
        }
        if self.grad_noise_tracker is not None:
            report["Gradient Noise Scale"] = \
                self.grad_noise_tracker.last_noise_scale
        return train_state, report

    def update_learning_rates(self, train_state, policy_lr, critic_lr):
        """Learner::UpdateLearningRates analog: mutate optimizer hyperparams
        in the opt state (Learner.cpp:705-707)."""
        self.config.policy_lr = policy_lr
        self.config.critic_lr = critic_lr
        train_state["policy_opt"][1].hyperparams["learning_rate"] = \
            jnp.asarray(policy_lr)
        train_state["value_opt"][1].hyperparams["learning_rate"] = \
            jnp.asarray(critic_lr)
        return train_state
