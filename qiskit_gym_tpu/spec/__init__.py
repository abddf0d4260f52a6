"""Numpy single-env executable specification.

These classes mirror the reference native env semantics exactly (reference
rust/src/envs/{permutation,linear_function,clifford,pauli}.rs and
rust/src/pauli/*), re-derived from the row-op/Pauli rules rather than
translated. They serve three roles:

1. ground truth for the JAX batched kernels in `qiskit_gym_tpu.ops`
   (bit-exact trace tests inject the same RNG decisions into both),
2. the backend of the single-env Gymnasium adapter, and
3. host-side solution replay (reconstructing Pauli rotation events).

All randomness flows through an explicit numpy Generator, and every random
decision (scramble actions, invert coin-flips, observe-time permutation
choice) can be injected for determinism.
"""

from .gates import Gate, parse_gateset, gate_arity
from .metrics import MetricsTracker, MetricsWeights
from .symmetry import (
    coupling_automorphisms,
    build_action_perm,
    compute_twists_square,
    compute_twists_clifford,
    compute_qubit_perms,
)
from .permutation import PermutationSpecEnv
from .linear_function import LinearFunctionSpecEnv
from .clifford import CliffordSpecEnv
from .pauli_env import PauliSpecEnv, PauliNetwork, ROTATION_MARKER, encode_rotation

SPEC_ENVS = {
    "PermutationEnv": PermutationSpecEnv,
    "LinearFunctionEnv": LinearFunctionSpecEnv,
    "CliffordEnv": CliffordSpecEnv,
    "PauliNetworkEnv": PauliSpecEnv,
}

__all__ = [
    "Gate",
    "parse_gateset",
    "gate_arity",
    "MetricsTracker",
    "MetricsWeights",
    "coupling_automorphisms",
    "build_action_perm",
    "compute_twists_square",
    "compute_twists_clifford",
    "compute_qubit_perms",
    "PermutationSpecEnv",
    "LinearFunctionSpecEnv",
    "CliffordSpecEnv",
    "PauliSpecEnv",
    "PauliNetwork",
    "ROTATION_MARKER",
    "encode_rotation",
    "SPEC_ENVS",
]
