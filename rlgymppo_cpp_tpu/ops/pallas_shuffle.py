"""Block-granular experience-window shuffle/gather.

The fused train step re-partitions the K-batch experience window every
iteration (GetAllBatchesShuffled, PPOLearner.cpp:103-299 /
ExperienceBuffer.cpp:106-121). Since an optimizer step SUMS its batch's
gradients, only the random partition of the window into batches matters,
so the shuffle moves contiguous blocks of rows (see
PPOLearnerConfig.shuffle_block_rows) instead of single rows — measured
105 ms/iter for the row-level gather at reference shape on a v5e vs
~18 ms for block-level.

These are deliberately the plain-jnp formulations: XLA's gather emitter
moves the contiguous block runs at ~65-80 GB/s, and a scalar-prefetched
Pallas block-permute kernel was measured SLOWER (25.6 ms vs 18.1 ms for
a 1.57M-row window) — its (1, R, inner) blocks DMA one 356-byte row at a
time while the XLA gather moves whole 45 KB runs. The dominant win was
block granularity itself, not the kernel.
"""

import jax.numpy as jnp


def block_shuffle(fields, perm, R):
    """Permute blocks of R rows of every array in `fields` (a flat list)
    by `perm` (int32 [n_blocks]; all arrays share n_blocks = rows // R).
    Shapes not divisible by R must pass R=1 (exact row-level shuffle)."""
    return [
        x.reshape(x.shape[0] // R, R, *x.shape[1:])[perm]
        .reshape(x.shape) for x in fields
    ]


def block_gather(x, idx, R):
    """Rows of blocks `idx` of x: x viewed as [rows//R, R, ...] indexed
    by idx (int32 [m]), flattened back to [m*R, ...]. This is how each
    optimizer batch pulls its blocks of the experience window."""
    nb = x.shape[0] // R
    return x.reshape(nb, R, *x.shape[1:])[idx].reshape(
        idx.shape[0] * R, *x.shape[1:])
