"""qiskit-gym-tpu: a TPU-native framework for RL-driven quantum circuit synthesis.

A ground-up JAX/XLA/Pallas re-design of the capabilities of AI4quantum/qiskit-gym
(reference layout: src/qiskit_gym + rust/src): SWAP-network permutation routing,
CNOT/linear-function synthesis over GF(2), Clifford synthesis on phase-less
symplectic tableaus, and Pauli-network synthesis, each exposed as RL environments
whose batched step/reset/observe/reward kernels run fully jit-compiled on TPU,
together with on-device PPO and AlphaZero training/search.

Subpackages
-----------
quantum   standalone quantum-info layer (circuit IR, Clifford tableau with phases,
          Pauli algebra, GF(2) linear functions, statevector test oracle) — no
          qiskit dependency; optional bridge in quantum.qiskit_interop.
spec      numpy single-env executable specification of the reference env
          semantics (rust/src/envs/*.rs); ground truth for the JAX kernels,
          backend for the Gymnasium adapter and host-side solution replay.
ops       the TPU fast path: packed-uint32 batched env kernels (vmap/jit).
envs      user-facing gym classes (PermutationGym, LinearFunctionGym,
          CliffordGym, PauliGym) with the reference's constructor surface.
models    policy networks (BasicPolicy MLP, Conv1dPolicy) in flax.
rl        PPO / AlphaZero on-device training loops, batched MCTS, solve().
parallel  device-mesh sharding of the env batch + data-parallel learner.
utils     serialization (JSON config + checkpoints), logging.
"""

__version__ = "0.1.0"

# Convenience top-level surface
from qiskit_gym_tpu.envs import (  # noqa: E402,F401
    CliffordGym,
    LinearFunctionGym,
    PauliGym,
    PermutationGym,
    SYNTH_ENVS,
    gym_adapter,
)
from qiskit_gym_tpu.rl import (  # noqa: E402,F401
    ALGORITHMS,
    POLICIES,
    AlphaZeroConfig,
    BasicPolicyConfig,
    Conv1dPolicyConfig,
    EvalConfig,
    PPOConfig,
    RLSynthesis,
)
