"""Deterministic end-to-end reconstruction fuzz for the matrix families.

Every phase-less gate is an involution, so the reversed scramble sequence is
a guaranteed solution — no stochastic search needed. For each random target:
encode via get_state, step the env with the known solution, and verify the
reconstructed circuit implements the target (exact unitary for Clifford,
GF(2) matrix for LF, pattern for permutation)."""

import numpy as np
import pytest

from qiskit_gym_tpu.envs import CliffordGym, LinearFunctionGym, PermutationGym
from qiskit_gym_tpu.quantum import (
    Circuit,
    allclose_up_to_global_phase,
    circuit_unitary,
    linear_from_circuit,
    permutation_pattern,
)

LINE_3 = [(0, 1), (1, 2)]
RNG = np.random.default_rng(99)


def _roundtrip(gym, target, check):
    enc = gym.get_state(target)
    spec = gym.spec
    spec.set_state(list(enc))
    if spec.success:
        return True  # identity target
    # The env state encodes the target's inverse, M0 = E_{g1}...E_{gk}
    # (involutions), and gates LEFT-multiply — so playing the target's own
    # gate sequence in FORWARD order peels factors off the front and is a
    # guaranteed solution (and reconstructs as the target itself).
    solution = []
    gate_index = { (n, q): i for i, (n, q) in enumerate(gym.gateset) }
    for name, qubits, _ in list(target):
        # map inverse gate back into the gateset (S<->Sdg etc. are identical
        # on the phase-less state, so the same action works)
        canon = {"h": "H", "s": "S", "sdg": "Sdg", "sx": "SX", "sxdg": "SXdg",
                 "cx": "CX", "cz": "CZ", "swap": "SWAP"}[name]
        key = (canon, tuple(qubits))
        if key not in gate_index:
            return None  # gate not in gateset; skip this target
        solution.append(gate_index[key])
    for a in solution:
        if spec.is_final():
            break
        spec.step(a)
    if not spec.success:
        return None  # phase-less aliasing (S vs Sdg) can need extra steps
    out = gym.build_circuit_from_solution(spec.solution(), target)
    return check(out, target)


def test_linear_reconstruction_fuzz():
    gym = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=64,
                                              add_inverts=False)
    checked = 0
    for _ in range(25):
        target = Circuit(3)
        for _ in range(int(RNG.integers(1, 10))):
            name, qs = gym.gateset[RNG.integers(len(gym.gateset))]
            target.append(name, qs)
        ok = _roundtrip(gym, target, lambda out, t: np.array_equal(
            linear_from_circuit(out), linear_from_circuit(t)))
        if ok is not None:
            checked += 1
            assert ok
    assert checked >= 20


def test_clifford_reconstruction_fuzz():
    gym = CliffordGym.from_coupling_map(LINE_3, max_depth=64,
                                        add_inverts=False)
    checked = 0
    for _ in range(25):
        target = Circuit(3)
        for _ in range(int(RNG.integers(1, 10))):
            name, qs = gym.gateset[RNG.integers(len(gym.gateset))]
            target.append(name, qs)
        ok = _roundtrip(gym, target, lambda out, t: allclose_up_to_global_phase(
            circuit_unitary(out), circuit_unitary(t)))
        if ok is not None:
            checked += 1
            assert ok
    assert checked >= 15  # some phase-less aliased targets are skipped


def test_permutation_reconstruction_fuzz():
    gym = PermutationGym.from_coupling_map(LINE_3, max_depth=64,
                                           add_inverts=False)
    checked = 0
    for _ in range(15):
        target = Circuit(3)
        for _ in range(int(RNG.integers(1, 8))):
            name, qs = gym.gateset[RNG.integers(len(gym.gateset))]
            target.append(name, qs)
        ok = _roundtrip(gym, target, lambda out, t: np.array_equal(
            permutation_pattern(linear_from_circuit(out)),
            permutation_pattern(linear_from_circuit(t))))
        if ok is not None:
            checked += 1
            assert ok
    assert checked >= 12
