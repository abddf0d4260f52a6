"""Policy networks (flax.linen) + torch checkpoint interop."""

from .policies import BasicPolicy, Conv1dPolicy, PolicyBundle, make_policy
from .torch_io import load_torch_checkpoint, save_torch_checkpoint
from .transfer import graft_action_head

__all__ = [
    "BasicPolicy",
    "Conv1dPolicy",
    "PolicyBundle",
    "make_policy",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
    "graft_action_head",
]
