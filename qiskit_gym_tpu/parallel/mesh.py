"""Mesh construction + sharding rules.

The workload's parallelism (cf. SURVEY.md section 2.4): env rollouts are
embarrassingly parallel over the batch -> shard the env-state leading axis
over a 'dp' mesh axis; the policies are small MLPs -> gradient reduction is
an XLA-inserted psum when the loss averages over the sharded batch, and the
hidden dimension can additionally be tensor-sharded over an 'mp' axis for
wide policies. All of it is expressed as sharding constraints inside one jit;
XLA SPMD inserts the collectives (no hand-written comm layer).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    mp: int = 1,
    axis_names: Sequence[str] = ("dp", "mp"),
) -> Mesh:
    """1-D data-parallel mesh by default; pass mp>1 for a 2-D (dp, mp) mesh."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by mp={mp}")
    import numpy as np

    grid = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(grid, axis_names=tuple(axis_names))


def shard_env_state(mesh: Mesh, state, batch_axis: int = 0):
    """Constrain every array in an env-state pytree to be sharded over 'dp'
    on `batch_axis` (0 for [B, ...] live state; 1 for pooled [slots, B, ...]
    reset stacks in rl/rollout.collect_packed)."""

    def constrain(x):
        spec = [None] * x.ndim
        spec[batch_axis] = "dp"
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(constrain, state)


def shard_params(mesh: Mesh, params):
    """Tensor-shard Dense kernels/biases over 'mp' (hidden dim); replicate the
    rest. On a 1-D mesh (mp=1) this is equivalent to full replication."""

    def constrain_leaf(path, x):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        is_kernel = names and names[-1] == "kernel"
        is_bias = names and names[-1] == "bias"
        # output heads stay replicated (their out dims are tiny)
        in_head = any(n in ("action_out", "value_out") for n in names)
        if is_kernel and not in_head and x.ndim == 2:
            spec = P(None, "mp")
        elif is_bias and not in_head and x.ndim == 1:
            spec = P("mp")
        else:
            spec = P(*([None] * x.ndim))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(constrain_leaf, params)


def replicate(mesh: Mesh, tree):
    def constrain(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(*([None] * jnp.ndim(x))))
        )

    return jax.tree.map(constrain, tree)
