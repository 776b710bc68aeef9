"""Branchless elementwise math usable inside Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) has no lowering for `atan`/`atan2`/
`asin`, which the physics tick needs (auto-flip roll angle, handbrake
heading, Heatseeker homing angles — Car.cpp:763-797, Ball.cpp:152-201).
This module provides a polynomial `atan2` with ~1 ulp f32 accuracy
(Cephes atanf argument reduction + minimax core) that lowers to plain
mul/add/div/select — legal in Pallas and on the jnp path alike. The
physics core uses THIS implementation on both paths so the fused Pallas
tick is bit-identical to the plain jnp tick.
"""

import jax.numpy as jnp

_PI = 3.141592653589793
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_TAN_PI_8 = 0.4142135623730950  # tan(pi/8); cephes branch threshold


def _atan_pos(x):
    """atan(x) for x >= 0, branchless Cephes atanf reduction.

    [0, tan(pi/8)) -> core poly; [tan(pi/8), tan(3pi/8)) -> pi/4 +
    atan((x-1)/(x+1)); [tan(3pi/8), inf) -> pi/2 - atan(1/x)."""
    big = x > 2.414213562373095
    mid = x > _TAN_PI_8
    xr = jnp.where(big, -1.0 / jnp.maximum(x, 1e-30),
                   jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    bias = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))
    z = xr * xr
    y = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    return y * z * xr + xr + bias


def atan2(y, x):
    """Elementwise atan2 matching jnp.arctan2 to ~1 ulp f32.

    atan2(0, 0) = 0, atan2(+-0, x<0) = pi (the -0 branch cut is not
    reproduced; physics consumers are tolerance-level)."""
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    both_zero = (ax == 0.0) & (ay == 0.0)
    a = _atan_pos(ay / jnp.where(both_zero, 1.0, ax))
    a = jnp.where(x < 0.0, _PI - a, a)
    a = jnp.where(both_zero, jnp.where(x < 0.0, _PI, 0.0), a)
    return jnp.where(y < 0.0, -a, a)
