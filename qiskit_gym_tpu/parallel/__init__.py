"""Device-mesh sharding: env batch data-parallel over ICI, policy params
optionally tensor-sharded over a model axis."""

from .mesh import make_mesh, shard_env_state, shard_params, replicate
from .distributed import initialize, is_primary, process_count

__all__ = ["make_mesh", "shard_env_state", "shard_params", "replicate",
           "initialize", "is_primary", "process_count"]
