"""TPU fast path: batched, jit-compiled env kernels.

Design (cf. SURVEY.md section 7; reference semantics in
rust/src/envs/*.rs, re-derived — not translated; every design choice below
was measured on v5e, see README "Design notes" and the git history):

- GF(2) matrix state (permutation/LinearFunction dim=n, Clifford dim=2n) is
  DENSE int8 [B, D, D]; applying per-env gate `a` is one batched MXU matmul
  M' = (G[a] @ M) & 1 against a static stack of elementary gate matrices,
  with exact int8 accumulation. (Packed-uint32 row-gather and rank-2 update
  formulations were built and measured slower: per-env gathers are
  lane-hostile and K=2 contractions starve the MXU.)
- The reference's 50%-per-step random state inversion would be an O(n^3)
  Gauss-Jordan per step; every env tracks its inverse (right-multiplied by
  the same involutive gate matrix), so inversion is a buffer swap.
- Metrics (CNOT count / layer counts) use closed-form running-max updates
  (layer sets are provably dense; see spec/metrics.py) with one-hot
  masked reductions instead of scatters.
- The Pauli network core keeps rotations as bit-planes + mod-4 phases with
  masked anti-commutation-DAG sweeps (ops/pauli.py).
- All randomness (reset scrambles, inversion flips, automorphism picks)
  consumes explicit PRNG keys; no host round-trips anywhere in an episode.
- bitops.py (packed-uint32 + butterfly bit-transpose) is kept as a tested
  utility; ops/pallas_step.py holds the hardware-verified fused-kernel
  baselines.
"""

from .bitops import pack_bits, unpack_bits, bit_transpose, packed_identity
from .tables import MetricsTables
from .matrix_env import MatrixEnvCore, MatrixEnvState
from .permutation import PermutationEnvCore, PermutationEnvState
from .pauli import PauliEnvCore, PauliEnvState

__all__ = [
    "pack_bits",
    "unpack_bits",
    "bit_transpose",
    "packed_identity",
    "MetricsTables",
    "MatrixEnvCore",
    "MatrixEnvState",
    "PermutationEnvCore",
    "PermutationEnvState",
    "PauliEnvCore",
    "PauliEnvState",
]
