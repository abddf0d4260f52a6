"""Checkpoint serialization.

Two on-disk formats:
- `.pt`    — torch state dicts, byte-compatible with the reference's shipped
             artifacts (examples/models/*.pt); handled by models/torch_io.py.
- anything else — flax msgpack (no torch dependency), the native format.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def save_params(params: dict, path: str) -> None:
    if path.endswith(".pt"):
        from qiskit_gym_tpu.models.torch_io import save_torch_checkpoint

        save_torch_checkpoint(params, path)
        return
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Optional[dict] = None) -> dict:
    if path.endswith(".pt"):
        from qiskit_gym_tpu.models.torch_io import load_torch_checkpoint

        return load_torch_checkpoint(path)
    from flax import serialization

    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
