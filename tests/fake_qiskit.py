"""Minimal qiskit shim so quantum/qiskit_interop.py runs under test.

The real image has no qiskit, so without this the bridge (reference surface:
`envs/synthesis.py:295-303,206-209` takes qiskit QuantumCircuit / Clifford /
PermutationGate / LinearFunction) would never execute. This builds just
enough of the qiskit module tree — `qiskit.QuantumCircuit`,
`qiskit.circuit.library.generalized_gates.{PermutationGate,LinearFunction}`,
`qiskit.quantum_info.Clifford` — mirroring the attribute surface the bridge
touches (`.data`, `.find_bit().index`, `.operation.{name,params}`,
`.tableau`, `.pattern`, `.linear`, and the per-gate append methods used by
`to_qiskit`). Installed/uninstalled via `install()` / `uninstall()`;
no-ops when real qiskit is importable.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_MODS = (
    "qiskit",
    "qiskit.circuit",
    "qiskit.circuit.library",
    "qiskit.circuit.library.generalized_gates",
    "qiskit.quantum_info",
)


class _Operation:
    def __init__(self, name, params=()):
        self.name = name
        self.params = list(params)


class _Instruction:
    def __init__(self, operation, qubits):
        self.operation = operation
        self.qubits = qubits


class _Bit:
    __slots__ = ("index",)

    def __init__(self, index):
        self.index = index


class QuantumCircuit:
    """Shape-compatible stand-in: gate methods take (*params, *qubits) like
    qiskit's, and `find_bit(bit)` returns an object with `.index`."""

    def __init__(self, num_qubits):
        self.num_qubits = num_qubits
        self.qubits = [_Bit(i) for i in range(num_qubits)]
        self.data = []

    def find_bit(self, bit):
        return bit  # _Bit already carries .index, like qiskit's BitLocations

    def _append(self, name, qubits, params=()):
        self.data.append(
            _Instruction(_Operation(name, params), [self.qubits[q] for q in qubits])
        )
        return self

    # 1q / 2q Cliffords
    def h(self, q):
        return self._append("h", (q,))

    def s(self, q):
        return self._append("s", (q,))

    def sdg(self, q):
        return self._append("sdg", (q,))

    def sx(self, q):
        return self._append("sx", (q,))

    def sxdg(self, q):
        return self._append("sxdg", (q,))

    def x(self, q):
        return self._append("x", (q,))

    def y(self, q):
        return self._append("y", (q,))

    def z(self, q):
        return self._append("z", (q,))

    def id(self, q):
        return self._append("id", (q,))

    def cx(self, c, t):
        return self._append("cx", (c, t))

    def cz(self, a, b):
        return self._append("cz", (a, b))

    def swap(self, a, b):
        return self._append("swap", (a, b))

    # rotations: qiskit signature is (theta, qubit)
    def rx(self, theta, q):
        return self._append("rx", (q,), (theta,))

    def ry(self, theta, q):
        return self._append("ry", (q,), (theta,))

    def rz(self, theta, q):
        return self._append("rz", (q,), (theta,))

    # something the bridge must reject
    def t(self, q):
        return self._append("t", (q,))


class Clifford:
    def __init__(self, tableau):
        self.tableau = np.asarray(tableau, dtype=bool)


class PermutationGate:
    def __init__(self, pattern):
        self.pattern = list(pattern)


class LinearFunction:
    def __init__(self, linear):
        self.linear = np.asarray(linear)


# envs/synthesis._maybe_from_qiskit dispatches on type(obj).__module__
# starting with "qiskit", exactly as it would for the real classes.
QuantumCircuit.__module__ = "qiskit.circuit.quantumcircuit"
Clifford.__module__ = "qiskit.quantum_info.operators.symplectic.clifford"
PermutationGate.__module__ = "qiskit.circuit.library.generalized_gates.permutation"
LinearFunction.__module__ = "qiskit.circuit.library.generalized_gates.linear_function"


def install():
    """Install the shim into sys.modules. Returns True if installed,
    False if real qiskit exists (shim not needed)."""
    try:
        import qiskit  # noqa: F401

        return False
    except ImportError:
        pass
    qiskit = types.ModuleType("qiskit")
    circuit = types.ModuleType("qiskit.circuit")
    library = types.ModuleType("qiskit.circuit.library")
    generalized = types.ModuleType("qiskit.circuit.library.generalized_gates")
    quantum_info = types.ModuleType("qiskit.quantum_info")

    qiskit.QuantumCircuit = QuantumCircuit
    qiskit.circuit = circuit
    circuit.library = library
    library.generalized_gates = generalized
    generalized.PermutationGate = PermutationGate
    generalized.LinearFunction = LinearFunction
    qiskit.quantum_info = quantum_info
    quantum_info.Clifford = Clifford

    for name, mod in zip(_MODS, (qiskit, circuit, library, generalized, quantum_info)):
        sys.modules[name] = mod
    return True


def uninstall():
    for name in _MODS:
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "QuantumCircuit", None) is QuantumCircuit:
            del sys.modules[name]
        elif mod is not None and name != "qiskit" and not hasattr(mod, "__file__"):
            del sys.modules[name]
