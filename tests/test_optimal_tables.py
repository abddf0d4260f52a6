"""Exact-optimum tables (scripts/optimal_bc.py): packed-int transitions
match the spec twin, and BFS / 0-1 Dial BFS distances match brute force
on small instances."""

import os
import sys
from itertools import product

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from optimal_bc import (U64, bfs, bfs_2q, matrix_actions, perm_actions,
                        steps_under_min2q)
from qiskit_gym_tpu.spec.clifford import CliffordSpecEnv
from qiskit_gym_tpu.spec.gates import parse_gateset
from qiskit_gym_tpu.spec.linear_function import LinearFunctionSpecEnv

LF_GS = [("CX", (0, 1)), ("CX", (1, 0)), ("CX", (1, 2)), ("CX", (2, 1))]
CLIFF_GS = [("CX", (0, 1)), ("CX", (1, 0)), ("SWAP", (0, 1)),
            ("H", (0,)), ("S", (0,))]


def _ident_key(dim):
    k = U64(0)
    for r in range(dim):
        k |= U64(1) << U64(dim * r + r)
    return k


def _mat_key(mat, dim):
    m = (np.asarray(mat).reshape(-1) > 0).astype(np.uint64)
    return U64((m << np.arange(dim * dim, dtype=np.uint64)).sum())


def test_lf_packed_transitions_match_spec():
    gs = parse_gateset(LF_GS)
    fns, dim = matrix_actions(gs, 3, "linear")
    spec = LinearFunctionSpecEnv(3, 1, gs, 2, 128, add_inverts=False,
                                 add_perms=False)
    rng = np.random.default_rng(0)
    spec.reset(scramble_actions=rng.integers(0, 4, 6))
    for a in rng.integers(0, 4, 20):
        key = np.array([_mat_key(spec.mat, dim)], np.uint64)
        spec.step(int(a), invert=False)
        assert fns[a](key)[0] == _mat_key(spec.mat, dim)


def test_lf_bfs_distances_match_brute_force():
    gs = parse_gateset(LF_GS)
    fns, dim = matrix_actions(gs, 3, "linear")
    _, keys, dist = bfs(fns, _ident_key(dim), lambda m: None)
    # GL(3,2) has 168 elements and line CX generates it all
    assert len(keys) == 168
    # brute force: every length-<=3 action word
    spec = LinearFunctionSpecEnv(3, 1, gs, 2, 128, add_inverts=False,
                                 add_perms=False)
    best = {}
    for L in range(4):
        for word in product(range(4), repeat=L):
            spec.reset(scramble_actions=[])
            for a in word:
                spec._apply_gate(gs[a])
            k = _mat_key(spec.mat, dim)
            if k not in best:
                best[k] = L
    for k, d in best.items():
        got = dist[np.searchsorted(keys, np.uint64(k))]
        assert got == d, (hex(int(k)), got, d)


def test_clifford_dial_bfs_respects_free_1q_gates():
    gs = parse_gateset(CLIFF_GS)
    fns, dim = matrix_actions(gs, 2, "clifford")
    costs = [0 if len(g[1]) == 1 else 1 for g in gs]
    keys, dist2q = bfs_2q(fns, costs, _ident_key(dim))
    # Sp(4,2) has 720 elements; this gateset generates all of it
    assert len(keys) == 720
    spec = CliffordSpecEnv(2, 1, gs, 2, 128, add_inverts=False,
                           add_perms=False)

    def key_of():
        return _mat_key(spec.mat, dim)

    def d_of(k):
        return int(dist2q[np.searchsorted(keys, np.uint64(k))])

    # any 1q-only word stays at 2q-distance 0
    spec.reset(scramble_actions=[])
    for a in (3, 4, 3, 4, 4):
        spec._apply_gate(gs[a])
        assert d_of(key_of()) == 0
    # a single CX is distance 1, and H/S dressing never raises it
    spec.reset(scramble_actions=[])
    spec._apply_gate(gs[0])
    assert d_of(key_of()) == 1
    spec._apply_gate(gs[3])
    assert d_of(key_of()) == 1
    # brute force the 2q-optimum over all words of <= 3 gates
    best = {}
    for L in range(4):
        for word in product(range(5), repeat=L):
            spec.reset(scramble_actions=[])
            c2 = 0
            for a in word:
                spec._apply_gate(gs[a])
                c2 += costs[a]
            k = key_of()
            if k not in best or c2 < best[k]:
                best[k] = c2
    for k, c2 in best.items():
        assert d_of(k) <= c2


def test_steps_pass_gives_terminating_descent():
    gs = parse_gateset(CLIFF_GS)
    fns, dim = matrix_actions(gs, 2, "clifford")
    costs = [0 if len(g[1]) == 1 else 1 for g in gs]
    ident = _ident_key(dim)
    keys, dist2q = bfs_2q(fns, costs, ident)
    steps = steps_under_min2q(keys, dist2q, fns, costs, ident)
    assert steps[np.searchsorted(keys, ident)] == 0
    rng = np.random.default_rng(1)
    carr = np.array(costs, np.int32)
    for k0 in rng.choice(keys, 40):
        k = np.uint64(k0)
        i = np.searchsorted(keys, k)
        m, used2q = int(steps[i]), 0
        for _ in range(m):
            i = np.searchsorted(keys, k)
            L, s = int(dist2q[i]), int(steps[i])
            nxt = None
            for a, f in enumerate(fns):
                nk = f(np.array([k], np.uint64))[0]
                j = np.searchsorted(keys, nk)
                if carr[a] + dist2q[j] == L and steps[j] == s - 1:
                    nxt = (a, nk)
                    break
            assert nxt is not None, "descent stuck"
            used2q += int(carr[nxt[0]])
            k = nxt[1]
        assert k == ident
        assert used2q == int(dist2q[np.searchsorted(keys, np.uint64(k0))])


def test_perm_pack_roundtrip():
    gs = parse_gateset([("SWAP", (0, 1)), ("SWAP", (1, 2)),
                        ("SWAP", (2, 3))])
    fns, unpack, pack = perm_actions(gs, 4)
    _, keys, dist = bfs(fns, pack(np.arange(4)[None])[0], lambda m: None)
    assert len(keys) == 24          # S_4
    assert int(dist.max()) == 6     # adjacent-transposition diameter 4*3/2
    states = unpack(keys)
    assert np.array_equal(np.sort(states, axis=1),
                          np.tile(np.arange(4), (24, 1)))
