"""User-facing synthesis gyms (constructor surface mirrors the reference)."""

from .synthesis import (
    BaseSynthesisEnv,
    CliffordGym,
    LinearFunctionGym,
    PermutationGym,
    PauliGym,
    SYNTH_ENVS,
    ONE_Q_GATES,
    TWO_Q_GATES,
    decode_pauli_solution,
)
from .adapters import (
    gym_adapter,
    GymnasiumEnv,
    vector_gym_adapter,
    VectorGymnasiumEnv,
)

__all__ = [
    "BaseSynthesisEnv",
    "CliffordGym",
    "LinearFunctionGym",
    "PermutationGym",
    "PauliGym",
    "SYNTH_ENVS",
    "ONE_Q_GATES",
    "TWO_Q_GATES",
    "decode_pauli_solution",
    "gym_adapter",
    "GymnasiumEnv",
    "vector_gym_adapter",
    "VectorGymnasiumEnv",
]
