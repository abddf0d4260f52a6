"""Checkpoint serialization.

Three on-disk formats:
- `.pt`    — torch state dicts, byte-compatible with the reference's shipped
             artifacts (examples/models/*.pt); handled by models/torch_io.py.
- a `.orbax` suffix or trailing-slash path (or an existing directory) —
  orbax PyTreeCheckpointer, the
  sharding-aware format for large / multi-host policies (supports async via
  `AsyncCheckpointer`, see `async_checkpointer()`).
- anything else — flax msgpack (no torch dependency), the native format.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _is_orbax_path(path: str) -> bool:
    # explicit markers work for not-yet-existing save targets too; a bare
    # pre-existing directory is also treated as orbax for loading
    return (path.endswith(".orbax") or path.endswith(os.sep)
            or os.path.isdir(path))


def save_params(params: dict, path: str) -> None:
    if path.endswith(".pt"):
        from qiskit_gym_tpu.models.torch_io import save_torch_checkpoint

        save_torch_checkpoint(params, path)
        return
    if _is_orbax_path(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), params, force=True)
        return
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Optional[dict] = None) -> dict:
    if path.endswith(".pt"):
        from qiskit_gym_tpu.models.torch_io import load_torch_checkpoint

        return load_torch_checkpoint(path)
    if _is_orbax_path(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if template is not None:
            return ckptr.restore(os.path.abspath(path), item=template)
        return ckptr.restore(os.path.abspath(path))
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


def async_checkpointer():
    """Orbax AsyncCheckpointer for non-blocking training checkpoints: save()
    returns immediately and serialization overlaps the next train step; call
    .wait_until_finished() before reading the checkpoint back."""
    import orbax.checkpoint as ocp

    return ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
