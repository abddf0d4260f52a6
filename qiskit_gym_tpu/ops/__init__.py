"""TPU fast path: batched, jit-compiled env kernels.

Design (cf. SURVEY.md section 7; reference semantics in
rust/src/envs/*.rs, re-derived — not translated):

- GF(2) matrix state (LinearFunction dim=n, Clifford dim=2n) is packed
  uint32 [rows, words]; every gate is <=2 row-XORs or a row-pair swap,
  expressed uniformly as `new[r] = M[perm[r]] ^ (mask[r] & M[xsrc[r]])`
  with per-action tables gathered at trace time — two row gathers per step,
  vmapped over thousands of envs.
- The reference's 50%-per-step random state inversion is O(n^3) per step if
  done naively; here every env carries the *transposed inverse* alongside the
  state (updated by the transposed gate tables at equal cost), so inversion
  becomes two in-register 32x32-block bit-transposes + a select.
- Metrics (CNOT count / layer counts) use closed-form running-max updates
  (layer sets are provably dense; see spec/metrics.py).
- Everything (reset scrambles, inversion coin-flips, rewards, masks, done
  flags) consumes explicit PRNG keys carried in the state pytree; no host
  round-trips anywhere in an episode.
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
