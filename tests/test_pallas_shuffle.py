"""Block shuffle/gather semantics (ops/pallas_shuffle.py).

The fused train step's window shuffle moves blocks of rows, and each
optimizer batch gathers its own blocks; these pins guarantee the block
forms are exact permutations/selections of rows (pure data movement)."""

import jax
import jax.numpy as jnp
import numpy as np

from rlgymppo_cpp_tpu.ops.pallas_shuffle import block_gather, block_shuffle


def _fields(rows, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return [
        jax.random.normal(k1, (rows, 89), jnp.float32),
        jax.random.randint(k2, (rows,), 0, 90),
        jax.random.normal(k3, (rows,), jnp.float32),
    ]


def test_block_shuffle_is_block_permutation():
    R, nb = 16, 24
    fields = _fields(R * nb)
    perm = jax.random.permutation(jax.random.PRNGKey(1), nb)
    out = block_shuffle(fields, perm, R)
    for x, y in zip(fields, out):
        x = np.asarray(x).reshape(nb, R, -1)
        y = np.asarray(y).reshape(nb, R, -1)
        np.testing.assert_array_equal(y, x[np.asarray(perm)])


def test_block_shuffle_R1_is_row_shuffle():
    fields = _fields(128)
    perm = jax.random.permutation(jax.random.PRNGKey(2), 128)
    out = block_shuffle(fields, perm, 1)
    for x, y in zip(fields, out):
        np.testing.assert_array_equal(np.asarray(y),
                                      np.asarray(x)[np.asarray(perm)])


def test_block_gather_selects_blocks():
    R, nb = 8, 32
    x = _fields(R * nb)[0]
    idx = jnp.asarray([5, 0, 31, 7, 7], jnp.int32)
    out = block_gather(x, idx, R)
    ref = np.asarray(x).reshape(nb, R, -1)[np.asarray(idx)].reshape(
        len(idx) * R, -1)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_partition_covers_window():
    """K batches gathered from a permutation partition reproduce the
    whole window exactly once (the fused step's consumption pattern)."""
    R, nb, K = 4, 12, 3
    x = _fields(R * nb)[0]
    perm = jax.random.permutation(jax.random.PRNGKey(3), nb)
    parts = perm.reshape(K, nb // K)
    rows = np.concatenate(
        [np.asarray(block_gather(x, p, R)) for p in parts])
    np.testing.assert_array_equal(
        np.sort(rows.sum(axis=1)), np.sort(np.asarray(x).sum(axis=1)))
