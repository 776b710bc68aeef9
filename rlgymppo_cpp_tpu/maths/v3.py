"""Component-wise vector/rotation types for the env-last physics core.

TPU layout rationale: XLA maps an array's minor-most dim to the 128-wide
vector lanes and the second-minor to 8 sublanes. The natural [N, P, 3]
AoS layout puts 3 (or P=2) on the lanes, padding every intermediate up to
64-170x and making the tick HBM-bound on padding (measured ~27 GB/tick at
N=4096). The core therefore keeps the big env axis LAST everywhere and
splits vectors into x/y/z component arrays: every elementwise op runs on
fully-packed [aux..., P, N] tiles.

V3 is a pytree of three same-shaped arrays; M3 is a rotation matrix as
three V3 columns (forward, right, up — matching RotMat's column order,
RocketSim src/Math/MathTypes/MathTypes.h:162-277). Masks broadcast against
components directly, so the `[..., None]` mask-expansion noise of the AoS
code disappears.
"""

import math

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class V3:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---------------------------------------------------------- constructors
    @staticmethod
    def zeros(shape, dtype=jnp.float32):
        z = jnp.zeros(shape, dtype)
        return V3(z, z, z)

    @staticmethod
    def of(x, y, z):
        return V3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                  jnp.asarray(z, jnp.float32))

    @staticmethod
    def from_last(arr):
        """[..., 3] -> V3 of [...] (no layout change; combine with to_core)."""
        return V3(arr[..., 0], arr[..., 1], arr[..., 2])

    def to_last(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # ------------------------------------------------------------- operators
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # ------------------------------------------------------------------ math
    def dot(self, o):
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o):
        return V3(self.y * o.z - self.z * o.y,
                  self.z * o.x - self.x * o.z,
                  self.x * o.y - self.y * o.x)

    def norm_sq(self):
        return self.dot(self)

    def norm(self):
        return jnp.sqrt(self.norm_sq())

    def normalized(self, eps=1e-12):
        inv = 1.0 / jnp.sqrt(jnp.maximum(self.norm_sq(), eps))
        return self * inv

    def clamp_norm(self, max_norm):
        n_sq = self.norm_sq()
        scale = jnp.where(n_sq > max_norm * max_norm,
                          max_norm / jnp.sqrt(jnp.maximum(n_sq, 1e-20)), 1.0)
        return self * scale

    def sum(self, axis):
        return V3(jnp.sum(self.x, axis=axis), jnp.sum(self.y, axis=axis),
                  jnp.sum(self.z, axis=axis))

    def at_get(self, idx):
        """Advanced-index every component (e.g. gather along a table)."""
        return V3(self.x[idx], self.y[idx], self.z[idx])

    def expand(self, axis):
        return V3(jnp.expand_dims(self.x, axis),
                  jnp.expand_dims(self.y, axis),
                  jnp.expand_dims(self.z, axis))

    def broadcast_to(self, shape):
        return V3(jnp.broadcast_to(self.x, shape),
                  jnp.broadcast_to(self.y, shape),
                  jnp.broadcast_to(self.z, shape))


def vwhere(mask, a, b):
    """Component-wise where over V3 (or plain arrays)."""
    if isinstance(a, V3) or isinstance(b, V3):
        ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
        bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
        return V3(jnp.where(mask, ax, bx), jnp.where(mask, ay, by),
                  jnp.where(mask, az, bz))
    return jnp.where(mask, a, b)


@struct.dataclass
class M3:
    """Rotation matrix as columns: f=forward (local +x), r=right (+y),
    u=up (+z)."""
    f: V3
    r: V3
    u: V3

    @staticmethod
    def identity(shape):
        o = jnp.ones(shape, jnp.float32)
        z = jnp.zeros(shape, jnp.float32)
        return M3(V3(o, z, z), V3(z, o, z), V3(z, z, o))

    @staticmethod
    def from_mat(rot):
        """[..., 3, 3] column-major rotmat -> M3 of [...]."""
        return M3(V3(rot[..., 0, 0], rot[..., 1, 0], rot[..., 2, 0]),
                  V3(rot[..., 0, 1], rot[..., 1, 1], rot[..., 2, 1]),
                  V3(rot[..., 0, 2], rot[..., 1, 2], rot[..., 2, 2]))

    def to_mat(self):
        cols = [self.f, self.r, self.u]
        return jnp.stack([c.to_last() for c in cols], axis=-1)

    def mv(self, v: V3) -> V3:
        """Local -> world: R @ v = f*vx + r*vy + u*vz."""
        return self.f * v.x + self.r * v.y + self.u * v.z

    def tmv(self, v: V3) -> V3:
        """World -> local: R^T @ v."""
        return V3(self.f.dot(v), self.r.dot(v), self.u.dot(v))

    def expand(self, axis):
        return M3(self.f.expand(axis), self.r.expand(axis),
                  self.u.expand(axis))


def mwhere(mask, a: M3, b: M3) -> M3:
    return M3(vwhere(mask, a.f, b.f), vwhere(mask, a.r, b.r),
              vwhere(mask, a.u, b.u))


def rodrigues(axis: V3, angle, v: V3) -> V3:
    """Rotate v around unit `axis` by `angle`."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return v * c + axis.cross(v) * s + axis * (axis.dot(v) * (1.0 - c))


# ------------------------------------------------------- layout converters

def to_core(arr, batch_ndim=1):
    """Public [batch..., rest...] -> core [reversed(rest)..., N]."""
    # explicit batch product: reshape(-1) divides by the rest-product,
    # which is 0 for empty axes (e.g. THE_VOID's zero boost pads)
    n = math.prod(arr.shape[:batch_ndim])
    a = arr.reshape((n,) + arr.shape[batch_ndim:])
    return jnp.transpose(a, axes=tuple(range(a.ndim - 1, -1, -1)))


def from_core(arr, batch_shape):
    """Core [reversed(rest)..., N] -> public [batch..., rest...]."""
    a = jnp.transpose(arr, axes=tuple(range(arr.ndim - 1, -1, -1)))
    return a.reshape(tuple(batch_shape) + a.shape[1:])


def v3_to_core(arr, batch_ndim=1):
    """Public vector [batch..., rest..., 3] -> V3 of core [rest_r..., N]."""
    return V3(to_core(arr[..., 0], batch_ndim),
              to_core(arr[..., 1], batch_ndim),
              to_core(arr[..., 2], batch_ndim))


def v3_from_core(v: V3, batch_shape):
    return jnp.stack([from_core(v.x, batch_shape),
                      from_core(v.y, batch_shape),
                      from_core(v.z, batch_shape)], axis=-1)


def m3_to_core(rot, batch_ndim=1):
    """Public [batch..., rest..., 3, 3] -> M3 of core [rest_r..., N]."""
    def col(k):
        return V3(to_core(rot[..., 0, k], batch_ndim),
                  to_core(rot[..., 1, k], batch_ndim),
                  to_core(rot[..., 2, k], batch_ndim))
    return M3(col(0), col(1), col(2))


def m3_from_core(m: M3, batch_shape):
    cols = []
    for c in (m.f, m.r, m.u):
        cols.append(jnp.stack([from_core(c.x, batch_shape),
                               from_core(c.y, batch_shape),
                               from_core(c.z, batch_shape)], axis=-1))
    return jnp.stack(cols, axis=-1)
