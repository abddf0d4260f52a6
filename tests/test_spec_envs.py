"""Tests for the numpy spec envs: gate semantics vs the quantum layer,
metrics equivalence, solution round-trips, and symmetry consistency."""

import numpy as np
import pytest

from qiskit_gym_tpu.quantum import (
    gf2_inverse,
    Circuit,
    Clifford,
    linear_from_circuit,
)
from qiskit_gym_tpu.spec import (
    CliffordSpecEnv,
    LinearFunctionSpecEnv,
    PermutationSpecEnv,
    MetricsTracker,
    MetricsWeights,
    compute_twists_square,
    parse_gateset,
)

RNG = np.random.default_rng(7)

LINE3 = [(0, 1), (1, 2)]


def line_gateset(names, n):
    gs = []
    for name in names:
        if name in ("CX", "CZ", "SWAP"):
            for i in range(n - 1):
                gs.append((name, (i, i + 1)))
                if name != "SWAP":
                    gs.append((name, (i + 1, i)))
        else:
            for q in range(n):
                gs.append((name, (q,)))
    return gs


# ------------------------------------------------------------------- metrics


def test_metrics_closed_form_equals_literal_sets():
    """|layers| == max(last)+1: closed form vs literal HashSet bookkeeping."""
    n = 5
    gates = line_gateset(["H", "S", "CX", "SWAP", "CZ"], n)
    for _ in range(20):
        tracker = MetricsTracker(n)
        layers, cnot_layers = set(), set()
        last_g = [-1] * n
        last_c = [-1] * n

        def lit_1q(q):
            last_g[q] += 1
            layers.add(last_g[q])

        def lit_cx(c, t):
            l = max(last_g[c], last_g[t]) + 1
            last_g[c] = last_g[t] = l
            layers.add(l)
            lc = max(last_c[c], last_c[t]) + 1
            last_c[c] = last_c[t] = lc
            cnot_layers.add(lc)

        for _ in range(60):
            g = gates[RNG.integers(len(gates))]
            tracker.apply_gate(parse_gateset([g])[0])
            name, qs = g
            if name == "CX":
                lit_cx(*qs)
            elif name == "SWAP":
                lit_cx(qs[0], qs[1]); lit_cx(qs[1], qs[0]); lit_cx(qs[0], qs[1])
            elif name == "CZ":
                lit_1q(qs[1]); lit_cx(qs[0], qs[1]); lit_1q(qs[1])
            else:
                lit_1q(qs[0])
            assert tracker.n_layers == len(layers)
            assert tracker.n_layers_cnots == len(cnot_layers)


def test_metrics_penalty_defaults():
    t = MetricsTracker(3)
    prev = t.snapshot()
    t.apply_gate(("CX", (0, 1)))
    w = MetricsWeights()
    # one CX: 0.01*1 + 0.0001*1 (+ cnot-layer and layer weights are 0)
    assert abs(t.penalty(prev, w) - 0.0101) < 1e-6


# ------------------------------------------------- env state-update semantics


def test_clifford_env_matches_tableau_encoding():
    """Stepping the env with a gate sequence reproduces the encoding of the
    corresponding circuit's Clifford: M(circuit) == tableau[:, :-1].T."""
    n = 3
    gs = line_gateset(["H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"], n)
    env = CliffordSpecEnv(n, 1, gs, 2, 128, add_inverts=False, add_perms=False)
    for _ in range(10):
        env.set_state(np.eye(2 * n, dtype=np.int64).flatten().tolist())
        qc = Circuit(n)
        for _ in range(15):
            a = int(RNG.integers(len(gs)))
            env.step(a)
            name, qubits = gs[a]
            qc.append(name, qubits)
        cf = Clifford(qc)
        expect = cf.tableau[:, :-1].T.astype(np.uint8)
        assert np.array_equal(env.get_state(), expect)


def test_linear_env_matches_linear_function():
    n = 4
    gs = line_gateset(["CX", "SWAP"], n)
    env = LinearFunctionSpecEnv(n, 1, gs, 2, 128, add_inverts=False, add_perms=False)
    for _ in range(10):
        env.set_state(np.eye(n, dtype=np.int64).flatten().tolist())
        qc = Circuit(n)
        for _ in range(12):
            a = int(RNG.integers(len(gs)))
            env.step(a)
            name, qubits = gs[a]
            qc.append(name, qubits)
        assert np.array_equal(env.get_state(), linear_from_circuit(qc))


def test_permutation_env_swap_and_observe():
    n = 4
    gs = [("SWAP", (i, i + 1)) for i in range(n - 1)]
    env = PermutationSpecEnv(n, 1, gs, 2, 128, add_inverts=False, add_perms=False)
    env.set_state([0, 1, 2, 3])
    env.step(0)  # SWAP(0,1)
    assert env.get_state().tolist() == [1, 0, 2, 3]
    obs = env.observe()
    # row i has bit at i*n + state[i]
    assert obs == [0 * n + 1, 1 * n + 0, 2 * n + 2, 3 * n + 3]
    assert not env.success
    env.step(0)
    assert env.success and env.reward() > 0.9


def test_solved_reward_and_penalty():
    n = 3
    gs = [("SWAP", (i, i + 1)) for i in range(n - 1)]
    env = PermutationSpecEnv(n, 1, gs, 2, 128, add_inverts=False, add_perms=False)
    env.set_state([1, 0, 2])
    env.step(0)  # solves; SWAP costs 3 cnots + 3 gates + 3 cnot layers + 3 layers
    w = MetricsWeights()
    expected = 1.0 - (3 * w.n_cnots + 3 * w.n_gates)
    assert abs(env.reward() - expected) < 1e-6
    assert env.is_final() and env.success


def test_depth_budget_and_final():
    n = 3
    gs = [("SWAP", (0, 1)), ("SWAP", (1, 2))]
    env = PermutationSpecEnv(n, 2, gs, 2, 128, add_inverts=False, add_perms=False)
    env.reset(scramble_actions=[0, 1])
    assert env.depth == 4
    steps = 0
    while not env.is_final():
        env.step(0)
        steps += 1
    assert steps <= 4


# ---------------------------------------------------------- invert + solution


def test_invert_roundtrip_linear():
    n = 4
    gs = line_gateset(["CX", "SWAP"], n)
    env = LinearFunctionSpecEnv(n, 2, gs, 2, 128, add_inverts=True, add_perms=False,
                                rng=np.random.default_rng(3))
    hits = 0
    for trial in range(300):
        env.reset()
        target = env.get_state().copy()
        if env.success:
            continue
        # random play with injected inversion decisions; then check solution
        while not env.is_final():
            a = int(RNG.integers(len(gs)))
            env.step(a, invert=bool(RNG.random() < 0.5))
        if not env.success:
            continue
        hits += 1
        sol = env.solution()
        qc = Circuit.from_gate_list([gs[a] for a in sol], n)
        # the env state encodes the *inverse* of the operator to synthesize
        # (get_state feeds the adjoint), so the solution circuit implements
        # target^{-1}: L(qc) == target^{-1}
        assert np.array_equal(linear_from_circuit(qc), gf2_inverse(target))
    assert hits > 0, "no successful episodes to validate"


def test_invert_roundtrip_clifford():
    n = 3
    gs = line_gateset(["H", "S", "CX"], n)
    env = CliffordSpecEnv(n, 1, gs, 2, 128, add_inverts=True, add_perms=False,
                          rng=np.random.default_rng(5))
    hits = 0
    for trial in range(400):
        env.reset()
        target = env.get_state().copy()
        if env.success:
            continue
        while not env.is_final():
            a = int(RNG.integers(len(gs)))
            env.step(a, invert=bool(RNG.random() < 0.5))
        if not env.success:
            continue
        hits += 1
        sol = env.solution()
        qc = Circuit.from_gate_list([gs[a] for a in sol], n)
        got = Clifford(qc).tableau[:, :-1].T.astype(np.uint8)
        assert np.array_equal(got, gf2_inverse(target))
    assert hits > 0, "no successful episodes to validate"


# ------------------------------------------------------------------ symmetry


def test_twists_square_identity_always_present():
    n = 3
    gs = [("SWAP", (0, 1)), ("SWAP", (1, 2))]
    obs_perms, act_perms = compute_twists_square(n, parse_gateset(gs))
    ident_obs = list(range(n * n))
    assert ident_obs in obs_perms
    assert list(range(len(gs))) in act_perms
    # line graph 0-1-2 has the reversal automorphism
    assert len(obs_perms) == 2


def test_twists_consistency_property():
    """Stepping with act_perm[a] on the original state == stepping with a on the
    relabeled state, for every automorphism."""
    n = 4
    gs = line_gateset(["CX", "SWAP"], n)
    parsed = parse_gateset(gs)
    obs_perms, act_perms = compute_twists_square(n, parsed)
    env = LinearFunctionSpecEnv(n, 4, gs, 2, 128, add_inverts=False, add_perms=False,
                                rng=np.random.default_rng(11))
    for obs_perm, act_perm in zip(obs_perms, act_perms):
        env.reset()
        base = env._dense_obs().reshape(-1)
        permuted = np.zeros_like(base)
        permuted[np.asarray(obs_perm)] = base  # obs_perm: old idx -> new idx
        for a in range(len(gs)):
            # step(relabeled state, relabeled action) == relabel(step(state, action))
            e1 = LinearFunctionSpecEnv(n, 1, gs, 2, 128, add_inverts=False,
                                       add_perms=False)
            e1.set_state(base.tolist())
            e1.step(a)
            o1 = e1._dense_obs().reshape(-1)
            p1 = np.zeros_like(o1)
            p1[np.asarray(obs_perm)] = o1
            e2 = LinearFunctionSpecEnv(n, 1, gs, 2, 128, add_inverts=False,
                                       add_perms=False)
            e2.set_state(permuted.tolist())
            e2.step(act_perm[a])
            assert np.array_equal(p1, e2._dense_obs().reshape(-1)), (obs_perm, a)


def test_masks_and_shapes():
    n = 3
    gs = line_gateset(["H", "S", "CX"], n)
    env = CliffordSpecEnv(n, 2, gs, 2, 128)
    env.reset()
    assert env.obs_shape() == [2 * n, 2 * n]
    assert len(env.masks()) == len(gs)
    assert env.num_actions() == len(gs)


# ------------------------------------------------------------- native (C++)


def test_native_automorphisms_match_python():
    """C++ VF2 (csrc/) agrees with the pure-Python fallback."""
    import pytest as _pytest

    from qiskit_gym_tpu.spec.symmetry import _python_automorphisms, _adjacency
    from qiskit_gym_tpu.utils.native import graph_automorphisms

    n = 9
    grid = [(r * 3 + c, r * 3 + c + 1) for r in range(3) for c in range(2)]
    grid += [(r * 3 + c, (r + 1) * 3 + c) for r in range(2) for c in range(3)]
    gs = parse_gateset([("SWAP", e) for e in grid])
    adj = _adjacency(n, gs)
    native = graph_automorphisms(n, adj)
    if native is None:
        _pytest.skip("native library not built")
    python = _python_automorphisms(n, adj)
    assert native == python
    assert len(native) == 8  # dihedral group of the 3x3 grid
