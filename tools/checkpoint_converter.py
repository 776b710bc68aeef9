"""Checkpoint converter: this framework <-> Python rlgym-ppo.

Counterpart of the reference's tools/checkpoint_converter.py (which bridges
RLGymPPO_CPP TorchScript `.lt` archives and rlgym-ppo `.pt` state dicts):

  to_python <tpu checkpoint folder>   -> PPO_POLICY.pt / PPO_VALUE_NET.pt
  to_tpu    <rlgym-ppo checkpoint folder> -> TRAIN_STATE.npz folder

Layer mapping: our MLP params are a list of {"w": [in, out], "b": [out]}
(models/mlp.py); torch Linear stores weight as [out, in], named
"model.{2i}.weight" / "model.{2i}.bias" in rlgym-ppo's Sequential (ReLUs
occupy the odd indices). Optimizer state is reset in both directions, like
the reference (checkpoint_converter.py:111-120).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _layers_from_state_dict(sd):
    """OrderedDict of torch tensors -> list of {'w','b'} numpy layers."""
    weights = {k: v for k, v in sd.items() if k.endswith(".weight")}
    idx = sorted(int(k.split(".")[-2]) for k in weights)
    layers = []
    for i in idx:
        prefix = next(k[: -len("weight")] for k in weights
                      if int(k.split(".")[-2]) == i)
        w = np.asarray(sd[prefix + "weight"].detach().cpu().numpy())
        b = np.asarray(sd[prefix + "bias"].detach().cpu().numpy())
        layers.append({"w": w.T.copy(), "b": b.copy()})
    return layers


def _state_dict_from_layers(layers, torch):
    sd = {}
    for i, layer in enumerate(layers):
        sd[f"model.{2 * i}.weight"] = torch.from_numpy(
            np.asarray(layer["w"]).T.copy())
        sd[f"model.{2 * i}.bias"] = torch.from_numpy(
            np.asarray(layer["b"]).copy())
    return sd


def to_python(ckpt_path, out_path="python_checkpoint"):
    import torch
    import jax
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
    from rlgymppo_cpp_tpu.utils import checkpoint as ckpt

    newest = ckpt.find_newest_checkpoint(ckpt_path) or ckpt_path
    with open(os.path.join(newest, "RUNNING_STATS.json")) as f:
        meta = json.load(f)
    shapes = meta["model_shapes"]

    # Reconstruct layer sizes from saved policy/value leaf shapes: the
    # tree flattens as policy layers first (b then w per layer, sorted
    # dict order) — instead derive from the npz directly.
    data = np.load(os.path.join(newest, "TRAIN_STATE.npz"))
    # Probe: rebuild a template with sizes from the stats file
    obs_size = meta.get("obs_size")
    action_amount = meta.get("action_amount")
    layer_sizes = meta.get("policy_layer_sizes")
    critic_sizes = meta.get("critic_layer_sizes")
    if obs_size is None:
        raise SystemExit(
            "Checkpoint lacks obs_size/action_amount metadata (older "
            "checkpoint?) — re-save with a current Learner first.")
    cfg = PPOLearnerConfig(policy_layer_sizes=tuple(layer_sizes),
                           critic_layer_sizes=tuple(critic_sizes))
    ppo = PPOLearner(obs_size, action_amount, cfg)
    template = ppo.init(jax.random.PRNGKey(0))
    flat_t, treedef = jax.tree.flatten(template)
    flat = [data[f"leaf_{i}"] for i in range(len(flat_t))]
    train_state = jax.tree.unflatten(treedef, flat)

    os.makedirs(out_path, exist_ok=True)
    torch.save(_state_dict_from_layers(train_state["policy"], torch),
               os.path.join(out_path, "PPO_POLICY.pt"))
    torch.save(_state_dict_from_layers(train_state["value"], torch),
               os.path.join(out_path, "PPO_VALUE_NET.pt"))
    print(f"Done! Partial rlgym-ppo checkpoint generated at {out_path!r}.")
    print("NOTE: Optimizer conversion is not supported; optimizers reset.")


def to_tpu(py_path, out_path="tpu_checkpoint", obs_size=None,
           action_amount=None):
    import torch
    import jax
    from rlgymppo_cpp_tpu.learn.ppo_learner import PPOLearner
    from rlgymppo_cpp_tpu.learn.config import PPOLearnerConfig
    from rlgymppo_cpp_tpu.utils import checkpoint as ckpt

    policy_sd = torch.load(os.path.join(py_path, "PPO_POLICY.pt"),
                           map_location="cpu")
    critic_sd = torch.load(os.path.join(py_path, "PPO_VALUE_NET.pt"),
                           map_location="cpu")
    policy_layers = _layers_from_state_dict(policy_sd)
    critic_layers = _layers_from_state_dict(critic_sd)

    obs_size = obs_size or policy_layers[0]["w"].shape[0]
    action_amount = action_amount or policy_layers[-1]["b"].shape[0]
    layer_sizes = tuple(l["b"].shape[0] for l in policy_layers[:-1])
    critic_sizes = tuple(l["b"].shape[0] for l in critic_layers[:-1])

    cfg = PPOLearnerConfig(policy_layer_sizes=layer_sizes,
                           critic_layer_sizes=critic_sizes)
    ppo = PPOLearner(obs_size, action_amount, cfg)
    train_state = ppo.init(jax.random.PRNGKey(0))
    train_state["policy"] = [
        {"w": np.asarray(l["w"], np.float32),
         "b": np.asarray(l["b"], np.float32)} for l in policy_layers]
    train_state["value"] = [
        {"w": np.asarray(l["w"], np.float32),
         "b": np.asarray(l["b"], np.float32)} for l in critic_layers]
    # Fresh optimizer states sized to the loaded params
    train_state["policy_opt"] = ppo.policy_optimizer.init(
        train_state["policy"])
    train_state["value_opt"] = ppo.value_optimizer.init(
        train_state["value"])

    stats = {
        "cumulative_timesteps": 0,
        "cumulative_model_updates": 0,
        "epoch": 0,
        "obs_size": int(obs_size),
        "action_amount": int(action_amount),
        "policy_layer_sizes": list(layer_sizes),
        "critic_layer_sizes": list(critic_sizes),
    }
    path = ckpt.save_checkpoint(out_path, 0, train_state, stats, keep=0)
    print(f"Done! TPU checkpoint generated at {path!r}.")
    print("NOTE: Optimizer conversion is not supported; optimizers reset.")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("direction", choices=["to_python", "to_tpu"])
    ap.add_argument("path")
    ap.add_argument("--out", default=None)
    ap.add_argument("--obs-size", type=int, default=None)
    ap.add_argument("--action-amount", type=int, default=None)
    args = ap.parse_args()
    if args.direction == "to_python":
        to_python(args.path, args.out or "python_checkpoint")
    else:
        to_tpu(args.path, args.out or "tpu_checkpoint",
               args.obs_size, args.action_amount)


if __name__ == "__main__":
    main()
