"""Piecewise-linear game curves as branchless select chains.

The reference walks a std::map per lookup (LinearPieceCurve::GetOutput,
RocketSim src/Math/Math.cpp:5-35). `jnp.interp` would compile to
searchsorted — a binary-search while-loop plus gathers, which profiled as
one of the hottest kernels of the physics tick on TPU. Every game curve
has <= 7 knots, so each lookup is instead unrolled into K-1 fused
elementwise select ops with zero gathers: pure VPU work.
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
            self.np_xs = xs[order]
            self.np_ys = ys[order]
        else:
            self.np_xs = None
            self.np_ys = None

    def __call__(self, x):
        if self.np_xs is None:
            return jnp.full(jnp.shape(x), self.default_output,
                            dtype=jnp.float32)
        xs, ys = self.np_xs, self.np_ys
        if len(xs) == 1:
            return jnp.full(jnp.shape(x), float(ys[0]), dtype=jnp.float32)
        # Running select over the (static, tiny) knot list: y starts at the
        # left clamp and each segment overwrites it where x lies past its
        # start. The final segment's clip provides the right clamp.
        y = jnp.full(jnp.shape(x), float(ys[0]), dtype=jnp.float32)
        for i in range(len(xs) - 1):
            x0, x1 = float(xs[i]), float(xs[i + 1])
            y0, y1 = float(ys[i]), float(ys[i + 1])
            t = jnp.clip((x - x0) / (x1 - x0), 0.0, 1.0)
            y = jnp.where(x >= x0, y0 + t * (y1 - y0), y)
        return y
