"""Policy networks (flax.linen) + torch checkpoint interop."""

from .policies import BasicPolicy, Conv1dPolicy, PolicyBundle, make_policy
from .torch_io import load_torch_checkpoint, save_torch_checkpoint

__all__ = [
    "BasicPolicy",
    "Conv1dPolicy",
    "PolicyBundle",
    "make_policy",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
]
