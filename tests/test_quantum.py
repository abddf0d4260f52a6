"""Tests for the standalone quantum-info layer against the statevector oracle."""

import numpy as np
import pytest

from qiskit_gym_tpu.quantum import (
    Circuit,
    Clifford,
    Pauli,
    Statevector,
    circuit_unitary,
    allclose_up_to_global_phase,
    linear_from_circuit,
    linear_from_clifford,
    permutation_pattern,
    gf2_inverse,
)

RNG = np.random.default_rng(1234)

CLIFFORD_1Q = ["h", "s", "sdg", "sx", "sxdg", "x", "y", "z"]
CLIFFORD_2Q = ["cx", "cz", "swap"]


def random_clifford_circuit(n, depth, rng):
    qc = Circuit(n)
    for _ in range(depth):
        if n >= 2 and rng.random() < 0.5:
            name = CLIFFORD_2Q[rng.integers(len(CLIFFORD_2Q))]
            q1, q2 = rng.choice(n, size=2, replace=False)
            qc.append(name, (int(q1), int(q2)))
        else:
            name = CLIFFORD_1Q[rng.integers(len(CLIFFORD_1Q))]
            qc.append(name, (int(rng.integers(n)),))
    return qc


# --------------------------------------------------------------------- circuit


def test_circuit_inverse_unitary():
    for n in (1, 2, 3):
        qc = random_clifford_circuit(n, 20, RNG)
        qc.rx(0.3, 0)
        qc.rz(-1.1, n - 1)
        u = circuit_unitary(qc)
        uinv = circuit_unitary(qc.inverse())
        assert np.allclose(uinv @ u, np.eye(2**n), atol=1e-8)


def test_circuit_compose_and_counts():
    a = Circuit(2).h(0).cx(0, 1)
    b = Circuit(2).swap(0, 1)
    c = a.compose(b)
    assert len(c) == 3 and c.num_2q_gates() == 2
    assert c.count_ops() == {"h": 1, "cx": 1, "swap": 1}
    assert c.depth() == 3


# ----------------------------------------------------------------------- pauli


def test_pauli_label_roundtrip():
    for label in ["XYZ", "-XIZ", "iY", "-iIIX", "IZ", "X"]:
        assert Pauli.from_label(label).to_label() == label.replace("+", "")


def test_pauli_little_endian():
    p = Pauli.from_label("XI")  # X on qubit 1
    assert p.x[1] and not p.x[0]


def _pauli_matrix(p: Pauli) -> np.ndarray:
    mats = {"I": np.eye(2), "X": np.array([[0, 1], [1, 0]]),
            "Y": np.array([[0, -1j], [1j, 0]]), "Z": np.diag([1, -1])}
    label = p.to_label()
    coeff = 1.0 + 0j
    if label.startswith("-i"):
        coeff, label = -1j, label[2:]
    elif label.startswith("i"):
        coeff, label = 1j, label[1:]
    elif label.startswith("-"):
        coeff, label = -1.0, label[1:]
    out = np.array([[coeff]])
    for ch in label:  # label is big-endian: leftmost = highest qubit
        out = np.kron(out, mats[ch])
    return out


def test_pauli_compose_matches_matrices():
    for _ in range(30):
        n = 3
        p1 = Pauli(RNG.random(n) < 0.5, RNG.random(n) < 0.5, RNG.integers(4))
        p2 = Pauli(RNG.random(n) < 0.5, RNG.random(n) < 0.5, RNG.integers(4))
        m = _pauli_matrix(p1.compose(p2))
        assert np.allclose(m, _pauli_matrix(p1) @ _pauli_matrix(p2))


def test_pauli_adjoint():
    for label in ["iXY", "-Z", "-iXX", "YZX"]:
        p = Pauli.from_label(label)
        assert np.allclose(_pauli_matrix(p.adjoint()), _pauli_matrix(p).conj().T)


def test_pauli_commutes():
    x, z = Pauli.from_label("X"), Pauli.from_label("Z")
    assert not x.commutes_with(z)
    assert Pauli.from_label("XX").commutes_with(Pauli.from_label("ZZ"))


def test_pauli_evolve_gate_matches_conjugation():
    gates = [("h", (0,)), ("s", (1,)), ("sdg", (0,)), ("sx", (2,)), ("sxdg", (1,)),
             ("cx", (0, 2)), ("cz", (1, 2)), ("swap", (0, 1)),
             ("x", (2,)), ("y", (0,)), ("z", (1,))]
    n = 3
    for name, qubits in gates:
        qc = Circuit(n).append(name, qubits)
        u = circuit_unitary(qc)
        for _ in range(10):
            p = Pauli(RNG.random(n) < 0.5, RNG.random(n) < 0.5, RNG.integers(4))
            q = p.copy().evolve_gate(name, qubits)
            assert np.allclose(_pauli_matrix(q), u @ _pauli_matrix(p) @ u.conj().T), (
                name, p.to_label(), q.to_label())


# -------------------------------------------------------------------- clifford


def test_clifford_gate_rules_match_unitaries():
    # Each row of Clifford(g) must be g P g^dag for the generator P.
    n = 2
    for name, qubits in [("h", (0,)), ("s", (0,)), ("sdg", (1,)), ("sx", (0,)),
                         ("sxdg", (1,)), ("cx", (0, 1)), ("cx", (1, 0)),
                         ("cz", (0, 1)), ("swap", (0, 1)), ("x", (0,)),
                         ("y", (1,)), ("z", (0,))]:
        qc = Circuit(n).append(name, qubits)
        cf = Clifford(qc)
        u = circuit_unitary(qc)
        for i in range(n):
            for base, row in ((Pauli.single(n, i, "X"), i), (Pauli.single(n, i, "Z"), n + i)):
                expect = u @ _pauli_matrix(base) @ u.conj().T
                got = _pauli_matrix(cf.row_pauli(row))
                assert np.allclose(got, expect), (name, qubits, row)


@pytest.mark.parametrize("n,depth", [(1, 8), (2, 20), (3, 40), (4, 60)])
def test_clifford_to_circuit_roundtrip(n, depth):
    for _ in range(5):
        qc = random_clifford_circuit(n, depth, RNG)
        cf = Clifford(qc)
        resynth = cf.to_circuit()
        assert Clifford(resynth) == cf
        assert allclose_up_to_global_phase(circuit_unitary(resynth), circuit_unitary(qc))


def test_clifford_adjoint_and_compose():
    for _ in range(5):
        qc1 = random_clifford_circuit(3, 25, RNG)
        qc2 = random_clifford_circuit(3, 25, RNG)
        c1, c2 = Clifford(qc1), Clifford(qc2)
        assert c1.compose(c1.adjoint()).is_identity()
        # compose = apply qc1 then qc2
        assert c1.compose(c2) == Clifford(qc1.compose(qc2))


def test_clifford_evolve_pauli():
    for _ in range(10):
        qc = random_clifford_circuit(3, 25, RNG)
        cf = Clifford(qc)
        p = Pauli(RNG.random(3) < 0.5, RNG.random(3) < 0.5, RNG.integers(4))
        via_rows = cf.evolve_pauli(p)
        via_gates = p.copy().evolve_circuit(qc)
        assert via_rows == via_gates, (via_rows.to_label(), via_gates.to_label())


# ---------------------------------------------------------------------- linear


def test_linear_from_circuit_matches_basis_action():
    n = 4
    for _ in range(10):
        qc = Circuit(n)
        for _ in range(15):
            if RNG.random() < 0.6:
                c, t = RNG.choice(n, 2, replace=False)
                qc.cx(int(c), int(t))
            else:
                a, b = RNG.choice(n, 2, replace=False)
                qc.swap(int(a), int(b))
        mat = linear_from_circuit(qc)
        for _ in range(5):
            v = RNG.integers(0, 2, size=n)
            idx = int(sum(int(v[q]) << q for q in range(n)))
            sv = Statevector(n)
            sv.data[:] = 0
            sv.data[idx] = 1
            sv.apply_circuit(qc)
            out_idx = int(np.argmax(np.abs(sv.data)))
            out_bits = np.array([(out_idx >> q) & 1 for q in range(n)])
            assert np.array_equal(out_bits, (mat @ v) % 2)


def test_linear_from_clifford_consistent():
    n = 4
    for _ in range(10):
        qc = Circuit(n)
        for _ in range(12):
            c, t = RNG.choice(n, 2, replace=False)
            qc.cx(int(c), int(t))
        assert np.array_equal(linear_from_clifford(Clifford(qc)), linear_from_circuit(qc))


def test_permutation_pattern_and_gf2_inverse():
    n = 5
    qc = Circuit(n).swap(0, 3).swap(1, 2).swap(3, 4)
    lf = linear_from_circuit(qc)
    pat = permutation_pattern(lf)
    assert sorted(pat.tolist()) == list(range(n))
    for _ in range(10):
        qc2 = Circuit(n)
        for _ in range(15):
            c, t = RNG.choice(n, 2, replace=False)
            qc2.cx(int(c), int(t))
        m = linear_from_circuit(qc2)
        assert np.array_equal((gf2_inverse(m) @ m) % 2, np.eye(n, dtype=np.uint8))


def test_clifford_synthesis_n6():
    for _ in range(3):
        qc = random_clifford_circuit(6, 80, RNG)
        cf = Clifford(qc)
        assert Clifford(cf.to_circuit()) == cf
        assert cf.compose(cf.adjoint()).is_identity()


def test_qiskit_interop_gated():
    """The bridge raises a clear ImportError without qiskit (and would
    convert if it were installed)."""
    import pytest as _pytest

    try:
        import qiskit  # noqa: F401
        has_qiskit = True
    except ImportError:
        has_qiskit = False

    from qiskit_gym_tpu.quantum import qiskit_interop

    if not has_qiskit:
        with _pytest.raises(ImportError, match="qiskit is not installed"):
            qiskit_interop.to_qiskit(Circuit(1).h(0))
    else:  # pragma: no cover - exercised only where qiskit exists
        qk = qiskit_interop.to_qiskit(Circuit(2).h(0).cx(0, 1).rz(0.3, 1))
        back = qiskit_interop.from_qiskit(qk)
        assert [g[0] for g in back] == ["h", "cx", "rz"]
