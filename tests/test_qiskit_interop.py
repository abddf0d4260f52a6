"""Executed coverage for quantum/qiskit_interop.py via the fake-qiskit shim.

The image ships no qiskit, so these tests install tests/fake_qiskit.py's
module tree and drive the bridge for circuit, Clifford, permutation, and
linear-function inputs — the reference's whole input surface
(reference envs/synthesis.py:206-209,254-258,295-303).
"""

import numpy as np
import pytest

import fake_qiskit
from qiskit_gym_tpu.quantum import (Circuit, Clifford, gf2_inverse,
                                    linear_from_circuit)


@pytest.fixture()
def qiskit_shim():
    installed = fake_qiskit.install()
    yield
    if installed:
        fake_qiskit.uninstall()


def test_from_qiskit_circuit(qiskit_shim):
    from qiskit import QuantumCircuit

    from qiskit_gym_tpu.quantum.qiskit_interop import from_qiskit

    qc = QuantumCircuit(3)
    qc.h(0).cx(0, 1).s(1).rz(0.375, 2).swap(0, 2)
    circ = from_qiskit(qc)
    assert isinstance(circ, Circuit)
    assert [(g.name, g.qubits, g.params) for g in circ] == [
        ("h", (0,), ()),
        ("cx", (0, 1), ()),
        ("s", (1,), ()),
        ("rz", (2,), (0.375,)),
        ("swap", (0, 2), ()),
    ]


def test_from_qiskit_unsupported_gate(qiskit_shim):
    from qiskit import QuantumCircuit

    from qiskit_gym_tpu.quantum.qiskit_interop import from_qiskit

    qc = QuantumCircuit(1)
    qc.t(0)
    with pytest.raises(ValueError, match="Unsupported gate 't'"):
        from_qiskit(qc)


def test_to_qiskit_roundtrip(qiskit_shim):
    from qiskit_gym_tpu.quantum.qiskit_interop import from_qiskit, to_qiskit

    circ = Circuit(2).h(0).cx(0, 1).rz(0.25, 1).sdg(0)
    qk = to_qiskit(circ)
    assert qk.num_qubits == 2
    back = from_qiskit(qk)
    assert [(g.name, g.qubits, g.params) for g in back] == [
        (g.name, g.qubits, g.params) for g in circ
    ]


def test_from_qiskit_clifford(qiskit_shim):
    from qiskit.quantum_info import Clifford as QkClifford

    from qiskit_gym_tpu.quantum.qiskit_interop import from_qiskit

    ours = Clifford(Circuit(2).h(0).cx(0, 1).s(1))
    converted = from_qiskit(QkClifford(ours.tableau))
    assert isinstance(converted, Clifford)
    assert converted == ours


def test_from_qiskit_permutation_and_linear(qiskit_shim):
    from qiskit.circuit.library.generalized_gates import (LinearFunction,
                                                          PermutationGate)

    from qiskit_gym_tpu.quantum.qiskit_interop import from_qiskit

    assert from_qiskit(PermutationGate([2, 0, 1])) == [2, 0, 1]
    mat = np.array([[1, 1, 0], [0, 1, 0], [0, 0, 1]])
    out = from_qiskit(LinearFunction(mat))
    assert out.dtype.kind == "i"
    assert np.array_equal(out, mat)


def test_env_get_state_accepts_qiskit_objects(qiskit_shim):
    """Converted qiskit objects flow into env.get_state — the reference's
    primary user path (synth(QuantumCircuit | PermutationGate |
    LinearFunction | Clifford))."""
    from qiskit import QuantumCircuit
    from qiskit.circuit.library.generalized_gates import (LinearFunction,
                                                          PermutationGate)
    from qiskit.quantum_info import Clifford as QkClifford

    from qiskit_gym_tpu.envs import (CliffordGym, LinearFunctionGym,
                                     PermutationGym)

    line3 = [[0, 1], [1, 2]]

    perm_env = PermutationGym.from_coupling_map(coupling_map=line3)
    assert perm_env.get_state(PermutationGate([2, 0, 1])) == \
        perm_env.get_state([2, 0, 1])

    lf_env = LinearFunctionGym.from_coupling_map(coupling_map=line3)
    mat = linear_from_circuit(Circuit(3).cx(0, 1).cx(1, 2))
    got = lf_env.get_state(LinearFunction(mat))
    assert got == gf2_inverse(mat).flatten().astype(int).tolist()
    # matches the circuit-input encoding of the same operator
    assert got == lf_env.get_state(Circuit(3).cx(0, 1).cx(1, 2))

    cl_env = CliffordGym.from_coupling_map(coupling_map=line3)
    ours = Circuit(3).h(0).cx(0, 1).s(1)
    qk = QuantumCircuit(3)
    qk.h(0).cx(0, 1).s(1)
    assert cl_env.get_state(qk) == cl_env.get_state(ours)
    assert cl_env.get_state(QkClifford(Clifford(ours).tableau)) == \
        cl_env.get_state(ours)
