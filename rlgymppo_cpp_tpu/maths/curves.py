"""Piecewise-linear game curves as vectorized interpolation.

The reference walks a std::map per lookup (LinearPieceCurve::GetOutput,
RocketSim src/Math/Math.cpp:5-35); here each curve is a pair of constant
arrays and lookups compile to a fused `jnp.interp` over any batch shape —
exactly what the VPU wants.
"""

import jax.numpy as jnp
import numpy as np


class LinearPieceCurve:
    """Clamped piecewise-linear curve.

    Outside the mapped range the first/last output value is returned,
    matching the reference (Math.cpp:12-13, 28-29). An empty curve returns
    `default_output`.
    """

    def __init__(self, value_mappings, default_output=1.0):
        self._points = tuple(value_mappings)
        self.default_output = float(default_output)
        if self._points:
            xs = np.array([p[0] for p in self._points], dtype=np.float32)
            ys = np.array([p[1] for p in self._points], dtype=np.float32)
            order = np.argsort(xs)
            self.xs = jnp.asarray(xs[order])
            self.ys = jnp.asarray(ys[order])
        else:
            self.xs = None
            self.ys = None

    def __call__(self, x):
        if self.xs is None:
            return jnp.full(jnp.shape(x), self.default_output, dtype=jnp.float32)
        if len(self._points) == 1:
            return jnp.full(jnp.shape(x), self._points[0][1], dtype=jnp.float32)
        return jnp.interp(x, self.xs, self.ys)
