"""Arena state clone/serialize parity utilities.

The reference supports Arena::Clone (Arena.cpp:673-701) and binary
Serialize/DeserializeNew via DataStream (Arena.cpp:572-671). Here the whole
batch state is a pytree of arrays, so clone is a tree copy and
serialization is an npz round trip keyed by flattened leaf order; a leaf
shape manifest guards against loading into a mismatched arena
(CollisionMeshFile/MutatorConfig-style structural validation).
"""

import numpy as np
import jax
import jax.numpy as jnp


def clone_state(state):
    """Arena::Clone analog: independent copy of a batch state pytree."""
    return jax.tree.map(jnp.copy, state)


def save_state(path, state):
    flat, _ = jax.tree.flatten(state)
    np.savez_compressed(
        path, num_leaves=np.int32(len(flat)),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_state(path, template):
    """Load into `template`'s structure; verifies leaf shapes/dtypes."""
    data = np.load(path)
    flat_t, treedef = jax.tree.flatten(template)
    if int(data["num_leaves"]) != len(flat_t):
        raise ValueError(
            f"State file has {int(data['num_leaves'])} leaves, template "
            f"has {len(flat_t)}")
    flat = []
    for i, t in enumerate(flat_t):
        leaf = data[f"leaf_{i}"]
        if tuple(leaf.shape) != tuple(t.shape):
            raise ValueError(
                f"Leaf {i} shape {leaf.shape} != template {t.shape}")
        flat.append(jnp.asarray(leaf, t.dtype))
    return jax.tree.unflatten(treedef, flat)
