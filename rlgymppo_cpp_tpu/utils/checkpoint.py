"""Checkpoint save/load with numbered-folder resume semantics.

Same layout policy as the reference (Learner.cpp:245-376): checkpoints live
in `<folder>/<cumulative_timesteps>/`, loading picks the highest-numbered
subfolder, old checkpoints beyond `checkpoints_to_keep` are deleted. Model
and optimizer pytrees go through orbax; running stats and bookkeeping go to
RUNNING_STATS.json (same filename, deliberately incompatible content —
Learner.cpp:242-243 does the same vs rlgym-ppo).

Model shapes are verified on load (torch silently loads mismatched models;
PPOLearner.cpp:391-409 guards this — so do we).
"""

import json
import os
import shutil

import numpy as np
import jax


def _leaf_shapes(tree):
    return [list(x.shape) for x in jax.tree.leaves(tree)]


def save_checkpoint(folder, timesteps, train_state, running_stats: dict,
                    keep: int = 5):
    path = os.path.join(folder, str(int(timesteps)))
    os.makedirs(path, exist_ok=True)

    flat, treedef = jax.tree.flatten(train_state)
    np.savez(os.path.join(path, "TRAIN_STATE.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
    meta = dict(running_stats)
    meta["model_shapes"] = _leaf_shapes(train_state)
    with open(os.path.join(path, "RUNNING_STATS.json"), "w") as f:
        json.dump(meta, f, indent=1)

    # Retention GC (Learner.cpp:256-280)
    if keep and keep > 0:
        entries = sorted(
            (int(d) for d in os.listdir(folder) if d.isdigit()))
        for old in entries[:-keep]:
            shutil.rmtree(os.path.join(folder, str(old)), ignore_errors=True)
    return path


def save_extra_tree(path, name, tree):
    """Save an auxiliary pytree (e.g. a SkillTracker policy snapshot) next
    to the main TRAIN_STATE (Learner.cpp saves SkillTracker versions via
    historical checkpoints; we store them directly)."""
    flat = jax.tree.leaves(tree)
    np.savez(os.path.join(path, f"{name}.npz"),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_extra_tree(path, name, template):
    """Load an auxiliary pytree saved by save_extra_tree; returns None if
    absent."""
    fpath = os.path.join(path, f"{name}.npz")
    if not os.path.exists(fpath):
        return None
    flat_t, treedef = jax.tree.flatten(template)
    data = np.load(fpath)
    flat = [data[f"leaf_{i}"] for i in range(len(flat_t))]
    return jax.tree.unflatten(treedef, flat)


def find_newest_checkpoint(folder):
    """Highest-numbered subfolder or None (Learner.cpp:285-308)."""
    if not folder or not os.path.isdir(folder):
        return None
    entries = [int(d) for d in os.listdir(folder) if d.isdigit()]
    if not entries:
        return None
    return os.path.join(folder, str(max(entries)))


def load_checkpoint(path, train_state_template):
    """Load into the template's structure; verifies leaf shapes."""
    with open(os.path.join(path, "RUNNING_STATS.json")) as f:
        meta = json.load(f)

    flat_t, treedef = jax.tree.flatten(train_state_template)
    data = np.load(os.path.join(path, "TRAIN_STATE.npz"))
    flat = [data[f"leaf_{i}"] for i in range(len(flat_t))]

    expected = _leaf_shapes(train_state_template)
    got = [list(x.shape) for x in flat]
    if expected != got:
        raise ValueError(
            f"Saved model has different shapes than current model.\n"
            f"Current: {expected}\nSaved: {got}")
    train_state = jax.tree.unflatten(treedef, flat)
    return train_state, meta
