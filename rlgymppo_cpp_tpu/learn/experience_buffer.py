"""On-device FIFO experience buffer.

Replaces the reference's tensor-shifting ExperienceBuffer
(src/private/RLGymPPO_CPP/PPO/ExperienceBuffer.{h,cpp}) with fixed-shape
device arrays and a single fused gather per submit. The fill level follows a
deterministic schedule (same submit size every iteration), so `cur_size` is
a *host-side static int* — jit re-traces only for the few distinct fill
levels before the buffer saturates, then never again.

Fresh storage is NaN-filled so uninitialized reads poison visibly, the same
paranoid trick as the reference (ExperienceBuffer.cpp:48-51).
"""

import functools

import jax
import jax.numpy as jnp

FIELDS = ("states", "actions", "log_probs", "values", "advantages")


@functools.partial(jax.jit, static_argnames=("cur_size", "max_size"))
def _submit(data, add, cur_size, max_size):
    """FIFO shift with static sizes: pure slices + concat, no gathers
    (random-access gathers are pathologically slow on TPU)."""
    add_amount = jax.tree.leaves(add)[0].shape[0]
    L = cur_size + add_amount
    start = max(L - max_size, 0)
    new_size = min(L, max_size)

    def merge(old_arr, new_arr):
        if L <= max_size:
            # append in place; slots beyond new_size keep old filler
            return jnp.concatenate(
                [old_arr[:cur_size], new_arr, old_arr[L:]], axis=0)
        # overflow: drop the oldest `start` rows
        return jnp.concatenate(
            [old_arr[start:cur_size], new_arr], axis=0)

    return jax.tree.map(merge, data, add), new_size


class ExperienceBuffer:
    def __init__(self, max_size: int, obs_size: int):
        self.max_size = max_size
        self.cur_size = 0
        self.data = {
            "states": jnp.full((max_size, obs_size), jnp.nan, jnp.float32),
            "actions": jnp.zeros((max_size,), jnp.int32),
            "log_probs": jnp.full((max_size,), jnp.nan, jnp.float32),
            "values": jnp.full((max_size,), jnp.nan, jnp.float32),
            "advantages": jnp.full((max_size,), jnp.nan, jnp.float32),
        }

    def submit_experience(self, add: dict):
        """FIFO append of a dict of [K, ...] arrays (keys = FIELDS).
        K > max_size keeps only the newest max_size rows
        (ExperienceBuffer.cpp:37-41)."""
        add_amount = int(jax.tree.leaves(add)[0].shape[0])
        if add_amount > self.max_size:
            add = jax.tree.map(lambda a: a[add_amount - self.max_size:], add)
        self.data, self.cur_size = _submit(
            self.data, add, self.cur_size, self.max_size)
        self.cur_size = int(self.cur_size)

    def get_shuffled_batch_indices(self, key, batch_size: int):
        """Shuffled full batches like GetAllBatchesShuffled
        (ExperienceBuffer.cpp:106-121): [n_batches, batch_size] indices into
        the valid region; the remainder is dropped."""
        n_batches = self.cur_size // batch_size
        perm = jax.random.permutation(key, self.cur_size)
        return perm[: n_batches * batch_size].reshape(n_batches, batch_size)

    def clear(self):
        self.cur_size = 0
