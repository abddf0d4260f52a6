"""Torch state-dict interop for the reference's shipped checkpoints.

The reference persists policies as flat torch state dicts with keys
`embeddings.{weight,bias}`, `common.{i}.{...}`, `action.{i}.{...}`,
`value.{i}.{...}` (examples/models/*.pt). Map those onto the flax layer
names used in models/policies.py (torch Linear weight is [out, in]; flax
Dense kernel is [in, out]).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _flax_name(torch_key: str, num_hidden: Dict[str, int]) -> str:
    """torch 'common.0.weight' -> flax path name."""
    parts = torch_key.split(".")
    group = parts[0]
    if group == "embeddings":
        return "embeddings"
    if group == "conv":
        return "conv"
    idx = int(parts[1])
    if group == "common":
        return f"common_{idx}"
    if group in ("action", "value"):
        # the torch stacks end with the output layer; hidden layers first
        last = num_hidden[group]
        prefix = "policy" if group == "action" else "value"
        if idx == last:
            return "action_out" if group == "action" else "value_out"
        return f"{prefix}_{idx}"
    raise KeyError(f"Unrecognized checkpoint key {torch_key!r}")


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pt state dict into flax params {'params': {...}}."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # count layers per head to identify the output layer index
    num_hidden: Dict[str, int] = {}
    for group in ("action", "value"):
        idxs = [int(k.split(".")[1]) for k in sd if k.startswith(group + ".")]
        num_hidden[group] = max(idxs) if idxs else 0

    params: dict = {}
    for key, tensor in sd.items():
        arr = np.asarray(tensor.detach().numpy())
        name = _flax_name(key, num_hidden)
        leaf = params.setdefault(name, {})
        if key.endswith("weight"):
            leaf["kernel"] = arr.T
        elif key.endswith("bias"):
            leaf["bias"] = arr
        else:
            raise KeyError(f"Unrecognized checkpoint key {key!r}")
    return {"params": params}


def save_torch_checkpoint(params: dict, path: str) -> None:
    """Write flax params back out in the reference torch state-dict format."""
    import torch

    p = params["params"] if "params" in params else params
    sd = {}

    def torch_key(name: str, n_policy: int, n_value: int) -> str:
        if name == "embeddings":
            return "embeddings"
        if name == "conv":
            return "conv"
        if name.startswith("common_"):
            return f"common.{name.split('_')[1]}"
        if name.startswith("policy_"):
            return f"action.{name.split('_')[1]}"
        if name.startswith("value_") and name != "value_out":
            return f"value.{name.split('_')[1]}"
        if name == "action_out":
            return f"action.{n_policy}"
        if name == "value_out":
            return f"value.{n_value}"
        raise KeyError(name)

    n_policy = sum(1 for k in p if k.startswith("policy_"))
    n_value = sum(1 for k in p if k.startswith("value_") and k != "value_out")
    for name, leaf in p.items():
        tk = torch_key(name, n_policy, n_value)
        sd[tk + ".weight"] = torch.from_numpy(np.asarray(leaf["kernel"]).T.copy())
        sd[tk + ".bias"] = torch.from_numpy(np.asarray(leaf["bias"]).copy())
    torch.save(sd, path)
