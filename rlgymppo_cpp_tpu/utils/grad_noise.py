"""Gradient-noise-scale measurement (OpenAI "An Empirical Model of
Large-Batch Training").

Equivalent of the reference's GradNoiseTracker
(src/private/RLGymPPO_CPP/Util/GradNoiseTracker.{h,cpp}): per PPO batch the
flattened policy gradient is accumulated; every `update_interval` batches
the small-batch (single batch) vs big-batch (interval-averaged) squared
gradient magnitudes yield the noise/scale estimates, each EMA-smoothed with
bias correction (GradNoiseTracker.cpp:21-24).

One deliberate fix vs the reference: its big-batch statistic averages the
*squares* of all accumulated gradient entries (an artifact of concatenating
[-1, 1] column views, GradNoiseTracker.cpp:36-44); here g_big is computed
from the entry-wise *mean gradient* across the interval, which is the
quantity the cited noise_scale.py actually uses.
"""

import numpy as np


class GradNoiseTracker:
    def __init__(self, batch_size: int, update_interval: int = 10,
                 average_decay: float = 0.9925):
        self.batch_small = float(batch_size)
        self.batch_big = float(batch_size * update_interval)
        self.update_interval = update_interval
        self.average_decay = average_decay

        self.step_count = 0
        self.moving_avg_scale = 0.0
        self.moving_avg_noise = 0.0
        self.last_noise_scale = 0.0
        self._grad_sum = None
        self._n_accum = 0

    def _ema(self, attr, x):
        decay = self.average_decay
        avg = getattr(self, attr) * decay + x * (1 - decay)
        setattr(self, attr, avg)
        return avg / (1 - decay ** (self.step_count + 1))

    def update(self, grad_flat) -> float:
        """Feed one batch's flattened gradient; returns the current
        (debiased) noise scale estimate."""
        g = np.asarray(grad_flat, np.float64).reshape(-1)
        self._grad_sum = g if self._grad_sum is None else self._grad_sum + g
        self._n_accum += 1

        if (self.step_count % self.update_interval) == \
                (self.update_interval - 1):
            mean_grad = self._grad_sum / self._n_accum
            self._grad_sum = None
            self._n_accum = 0

            g_big = float(np.mean(mean_grad ** 2))
            g_small = float(np.mean(g ** 2))

            b_s, b_b = self.batch_small, self.batch_big
            cur_noise = (b_b * g_big - b_s * g_small) / (b_b - b_s)
            cur_scale = abs((g_small - g_big) / (1 / b_s - 1 / b_b))

            scale = self._ema("moving_avg_scale", cur_scale)
            noise = self._ema("moving_avg_noise", cur_noise)
            if noise != 0:
                self.last_noise_scale = scale / noise

        self.step_count += 1
        return self.last_noise_scale
