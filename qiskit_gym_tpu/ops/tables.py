"""Static per-action tables compiled from a gateset at env-build time.

Every LF/Clifford gate is (<=2 disjoint row-XORs) or (a row permutation), so
a single uniform kernel applies any action:

    new[r] = M[perm[r]] ^ (mask[r] & M[xsrc[r]])

`GateTables` holds `perm/mask/xsrc` stacks indexed by action for the state
matrix (left-multiplication by the gate's symplectic matrix G) and the
transposed tables (for the tracked transposed-inverse, updated by G^T).
Gate row-op semantics follow the reference env cores
(rust/src/envs/clifford.rs:84-133, linear_function.rs:62-83).

`MetricsTables` holds the per-action circuit-cost descriptors used by the
closed-form metrics update (see spec/metrics.py for the dense-layers proof).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from qiskit_gym_tpu.spec.gates import Gate

from .bitops import padded_rows

# action type codes for metrics
MT_1Q, MT_CX, MT_CZ, MT_SWAP = 0, 1, 2, 3


@dataclass(frozen=True)
class GateTables:
    """Per-action row-op tables. Arrays are numpy; envs move them to device."""

    perm: np.ndarray   # int32 [A, R]  row gather for state
    mask: np.ndarray   # uint32 [A, R] all-ones where a XOR applies
    xsrc: np.ndarray   # int32 [A, R]  XOR source row
    perm_t: np.ndarray  # same, for the transposed-inverse buffer (G^T)
    mask_t: np.ndarray
    xsrc_t: np.ndarray

    @property
    def num_actions(self) -> int:
        return self.perm.shape[0]


def _empty_ops(A: int, R: int):
    perm = np.tile(np.arange(R, dtype=np.int32), (A, 1))
    mask = np.zeros((A, R), dtype=np.uint32)
    xsrc = np.tile(np.arange(R, dtype=np.int32), (A, 1))
    return perm, mask, xsrc


class _RowOpBuilder:
    """Accumulates swaps + XORs for one action into table rows."""

    def __init__(self, R: int):
        self.R = R
        self.perm = np.arange(R, dtype=np.int32)
        self.xors: List[Tuple[int, int]] = []  # (dest, src)

    def swap(self, r1: int, r2: int):
        self.perm[[r1, r2]] = self.perm[[r2, r1]]

    def xor(self, dest: int, src: int):
        self.xors.append((dest, src))

    def finish(self):
        mask = np.zeros(self.R, dtype=np.uint32)
        xsrc = np.arange(self.R, dtype=np.int32)
        for dest, src in self.xors:
            assert mask[dest] == 0, "row-op tables require disjoint XOR dests"
            mask[dest] = 0xFFFFFFFF
            xsrc[dest] = src
        return self.perm, mask, xsrc


def _clifford_row_ops(gate: Gate, n: int, transposed: bool) -> _RowOpBuilder:
    """Row ops of the gate's phase-less symplectic action (or its transpose).

    Transpose of `row d ^= row s` (I + e_d e_s^T) is `row s ^= row d`;
    row-swap permutations here are symmetric (involutions of two rows).
    """
    b = _RowOpBuilder(padded_rows(2 * n))
    name, qs = gate

    def xor(d, s):
        if transposed:
            b.xor(s, d)
        else:
            b.xor(d, s)

    if name == "H":
        (q,) = qs
        b.swap(q, n + q)
    elif name in ("S", "Sdg"):
        (q,) = qs
        xor(n + q, q)
    elif name in ("SX", "SXdg"):
        (q,) = qs
        xor(q, n + q)
    elif name == "CX":
        c, t = qs
        xor(t, c)
        xor(n + c, n + t)
    elif name == "CZ":
        a2, b2 = qs
        xor(n + a2, b2)
        xor(n + b2, a2)
    elif name == "SWAP":
        a2, b2 = qs
        b.swap(a2, b2)
        b.swap(n + a2, n + b2)
    else:
        raise ValueError(f"Unknown Clifford gate {name}")
    return b


def _linear_row_ops(gate: Gate, n: int, transposed: bool) -> _RowOpBuilder:
    b = _RowOpBuilder(padded_rows(n))
    name, qs = gate
    if name == "CX":
        q1, q2 = qs
        if transposed:
            b.xor(q1, q2)
        else:
            b.xor(q2, q1)
    elif name == "SWAP":
        q1, q2 = qs
        b.swap(q1, q2)
    # 1q gates: identity on a linear function
    return b


def build_gate_tables(gateset: Sequence[Gate], num_qubits: int, kind: str) -> GateTables:
    """kind: 'clifford' (dim=2n) or 'linear' (dim=n)."""
    builder = _clifford_row_ops if kind == "clifford" else _linear_row_ops
    A = len(gateset)
    R = padded_rows(2 * num_qubits if kind == "clifford" else num_qubits)
    perm, mask, xsrc = _empty_ops(A, R)
    perm_t, mask_t, xsrc_t = _empty_ops(A, R)
    for a, gate in enumerate(gateset):
        perm[a], mask[a], xsrc[a] = builder(gate, num_qubits, False).finish()
        perm_t[a], mask_t[a], xsrc_t[a] = builder(gate, num_qubits, True).finish()
    return GateTables(perm, mask, xsrc, perm_t, mask_t, xsrc_t)


@dataclass(frozen=True)
class MetricsTables:
    """Per-action metrics descriptors: type code + the two qubits."""

    mtype: np.ndarray  # int32 [A]
    q1: np.ndarray     # int32 [A]
    q2: np.ndarray     # int32 [A]  (== q1 for 1q gates)

    @classmethod
    def build(cls, gateset: Sequence[Gate]) -> "MetricsTables":
        mtype, q1, q2 = [], [], []
        for name, qs in gateset:
            if name == "CX":
                mtype.append(MT_CX); q1.append(qs[0]); q2.append(qs[1])
            elif name == "CZ":
                mtype.append(MT_CZ); q1.append(qs[0]); q2.append(qs[1])
            elif name == "SWAP":
                mtype.append(MT_SWAP); q1.append(qs[0]); q2.append(qs[1])
            else:
                mtype.append(MT_1Q); q1.append(qs[0]); q2.append(qs[0])
        return cls(
            np.asarray(mtype, np.int32),
            np.asarray(q1, np.int32),
            np.asarray(q2, np.int32),
        )


def build_permutation_tables(gateset: Sequence[Gate], num_qubits: int) -> np.ndarray:
    """tau[a] = transposition permutation of action a (identity for non-SWAP)."""
    A = len(gateset)
    tau = np.tile(np.arange(num_qubits, dtype=np.int32), (A, 1))
    for a, (name, qs) in enumerate(gateset):
        if name == "SWAP":
            q1, q2 = qs
            tau[a, [q1, q2]] = tau[a, [q2, q1]]
    return tau
