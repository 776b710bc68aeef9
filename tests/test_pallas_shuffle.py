"""Pallas block-shuffle kernel: parity with the jnp gather formulation.

The kernel is pure data movement (ops/pallas_shuffle.py), so equality is
bit-exact. Interpret mode runs the same Mosaic lowering path on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlgymppo_cpp_tpu.ops.pallas_shuffle import block_shuffle


@pytest.mark.parametrize("R", [128, 256])
def test_block_shuffle_matches_gather(R):
    nb = 12
    rows = nb * R
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    fields = [
        jax.random.normal(ks[0], (rows, 89), jnp.float32),
        jax.random.randint(ks[1], (rows,), 0, 90, jnp.int32),
        jax.random.normal(ks[2], (rows,), jnp.float32),
    ]
    perm = jax.random.permutation(ks[3], nb)

    out = block_shuffle(fields, perm, R, interpret=True)
    for x, o in zip(fields, out):
        ref = x.reshape(nb, R, *x.shape[1:])[perm].reshape(x.shape)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(ref))


def test_block_shuffle_fallback_unaligned():
    # R=1 blocks aren't lane-aligned -> jnp fallback, still exact
    rows, nb = 64, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (rows, 7), jnp.float32)
    perm = jax.random.permutation(jax.random.PRNGKey(2), nb)
    (out,) = block_shuffle([x], perm, 1, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[perm]))


def test_fused_step_shuffle_partitions_window():
    """The fused step's shuffle must be a PARTITION of the window: every
    row appears exactly once across the K optimizer batches."""
    R, K, total = 4, 3, 16   # tiny; R | total
    nb = (K * total) // R
    rows = K * total
    vals = jnp.arange(rows, dtype=jnp.float32)[:, None]
    perm = jax.random.permutation(jax.random.PRNGKey(3), nb)
    (out,) = block_shuffle([vals], perm, R, interpret=True)
    assert sorted(np.asarray(out).ravel().tolist()) == list(range(rows))
