"""Batched Pauli-network env on device — placeholder.

The full fixed-shape kernel design (masked rotation columns, bitmask
anti-commutation DAG, on-device trivial-rotation sweep) lands after the
PPO/AZ stack; the spec env (spec/pauli_env.py) already provides the
single-env semantics.
"""

from __future__ import annotations

from typing import NamedTuple


class PauliEnvState(NamedTuple):
    pass


class PauliEnvCore:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "PauliEnvCore (batched) is not implemented yet; use spec.PauliSpecEnv"
        )
