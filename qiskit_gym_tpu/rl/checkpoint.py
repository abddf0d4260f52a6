"""Full training-state checkpointing (resume-capable).

The reference persists policy weights only (reference rl/synthesis.py:77-93,
twisterl periodic checkpoints are torch state dicts), so an interrupted run
restarts its optimizer, RNG stream, and curriculum from scratch. A training
snapshot here additionally carries the Adam state, the PRNG key, the
iteration count, and the current curriculum difficulty, so `learn()`
continues exactly where it stopped. One flax-msgpack file, no torch needed.

Works for both PPO and AZ (identical attribute surface: env / params /
opt_state / key / iteration).
"""

from __future__ import annotations

import numpy as np


def save_training_state(algo, path: str) -> None:
    import jax
    from flax import serialization

    opt_leaves = [np.asarray(x)
                  for x in jax.tree_util.tree_leaves(algo.opt_state)]
    payload = {
        "params": jax.tree.map(np.asarray, algo.params),
        "opt": {str(i): leaf for i, leaf in enumerate(opt_leaves)},
        "key": np.asarray(jax.random.key_data(algo.key)),
        "iteration": np.int32(algo.iteration),
        "difficulty": np.int32(getattr(algo.env, "difficulty", 1)),
        "best_difficulty": np.int32(getattr(algo, "best_difficulty", 0)),
    }
    if getattr(algo, "best_params", None) is not None:
        payload["best_params"] = jax.tree.map(np.asarray, algo.best_params)
    # atomic swap: a kill mid-write (the exact scenario this resume feature
    # exists for) must not truncate the only snapshot
    import os
    import tempfile

    data = serialization.msgpack_serialize(payload)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               prefix=os.path.basename(path) + ".tmp")
    # mkstemp creates 0600; restore normal umask-derived perms so other
    # users/tooling can still read the snapshot after the atomic swap
    umask = os.umask(0)
    os.umask(umask)
    os.fchmod(fd, 0o666 & ~umask)
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_training_state(algo, path: str) -> None:
    """Restore in place. The optimizer-state pytree is rebuilt against the
    live `algo.opt_state` structure (leaves are stored flat), so the
    algorithm must be constructed with the same policy/config first."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    algo.params = serialization.from_state_dict(algo.params,
                                                payload["params"])
    treedef = jax.tree_util.tree_structure(algo.opt_state)
    n = len(payload["opt"])
    leaves = [jnp.asarray(payload["opt"][str(i)]) for i in range(n)]
    algo.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    algo.key = jax.random.wrap_key_data(jnp.asarray(payload["key"]))
    algo.iteration = int(payload["iteration"])
    algo.env.difficulty = int(payload["difficulty"])
    algo.best_difficulty = int(payload.get("best_difficulty", 0))
    if "best_params" in payload:
        algo.best_params = serialization.from_state_dict(
            jax.tree.map(lambda x: x, algo.params), payload["best_params"])
