"""Bit-exact trace tests: JAX batched kernels vs the numpy spec envs.

Given identical (state, action, inversion-decision) sequences, observations,
success/done flags, depth, metrics counters, and rewards must match
element-wise across the batch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.ops import (
    MatrixEnvCore,
    PermutationEnvCore,
    pack_bits,
    unpack_bits,
    bit_transpose,
)
from qiskit_gym_tpu.spec import (
    CliffordSpecEnv,
    LinearFunctionSpecEnv,
    PermutationSpecEnv,
)

RNG = np.random.default_rng(2024)


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


# -------------------------------------------------------------------- bitops


@pytest.mark.parametrize("dim", [5, 17, 32, 33, 54, 64])
def test_pack_unpack_roundtrip(dim):
    mat = (RNG.random((dim, dim)) < 0.5).astype(np.uint8)
    packed = pack_bits(mat)
    out = np.asarray(unpack_bits(jnp.asarray(packed)[None], dim))[0]
    assert np.array_equal(out, mat)


@pytest.mark.parametrize("dim", [5, 31, 32, 54, 64])
def test_bit_transpose(dim):
    mat = (RNG.random((dim, dim)) < 0.5).astype(np.uint8)
    # embed as block-diag(M, I) like the envs do
    packed = pack_bits(mat)
    t = np.asarray(bit_transpose(jnp.asarray(packed)[None]))[0]
    out = np.asarray(unpack_bits(jnp.asarray(t)[None], dim))[0]
    assert np.array_equal(out, mat.T)


# ------------------------------------------------------------- trace helpers


def run_trace(core, specs, set_states, T=24, seed=0):
    """Drive B spec envs and the batched core with identical actions+flips."""
    B = len(specs)
    rng = np.random.default_rng(seed)
    A = core.num_actions
    state = core.set_state(np.stack(set_states))
    for s, st in zip(specs, set_states):
        s.set_state(np.asarray(st).reshape(-1).tolist())

    key = jax.random.key(seed)
    step = jax.jit(core.step)
    for t in range(T):
        actions = rng.integers(0, A, size=B)
        flips = rng.random(B) < 0.5
        was_final = np.array([s.is_final() for s in specs])
        for b, s in enumerate(specs):
            if not was_final[b]:
                s.step(int(actions[b]), invert=bool(flips[b]))
        key, sub = jax.random.split(key)
        prev = state
        state = step(state, jnp.asarray(actions), sub,
                     invert_override=jnp.asarray(flips))
        # spec envs stop stepping once final; freeze those lanes in the core too
        done = jnp.asarray(was_final)
        state = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape(done.shape + (1,) * (new.ndim - 1)), old, new
            ),
            state, prev,
        )
        compare(core, state, specs)
    return state


def compare(core, state, specs):
    dense = np.asarray(core.dense(state))
    depth = np.asarray(state.depth)
    success = np.asarray(state.success)
    reward = np.asarray(state.reward)
    inverted = np.asarray(state.inverted)
    n_cnots = np.asarray(state.n_cnots)
    n_gates = np.asarray(state.n_gates)
    max_g = np.asarray(state.max_g)
    max_c = np.asarray(state.max_c)
    for b, s in enumerate(specs):
        if hasattr(s, "mat") or hasattr(s, "state"):
            want = s._dense_obs()
            assert np.array_equal(dense[b], want), f"lane {b} state mismatch"
        assert depth[b] == s.depth, f"lane {b} depth"
        assert success[b] == s.success, f"lane {b} success"
        assert inverted[b] == s.inverted, f"lane {b} inverted"
        assert n_cnots[b] == s.metrics.n_cnots
        assert n_gates[b] == s.metrics.n_gates
        assert max_g[b] + 1 == s.metrics.n_layers
        assert max_c[b] + 1 == s.metrics.n_layers_cnots
        assert abs(reward[b] - s.reward()) < 1e-6, f"lane {b} reward"


# ---------------------------------------------------------------- the traces


def _random_invertible_gf2(n, rng):
    while True:
        m = (rng.random((n, n)) < 0.5).astype(np.uint8)
        try:
            from qiskit_gym_tpu.quantum import gf2_inverse
            gf2_inverse(m)
            return m
        except ValueError:
            continue


def test_linear_env_trace_matches_spec():
    n, B = 5, 8
    gs = line_gateset(["CX", "SWAP"], n)
    core = MatrixEnvCore(n, gs, "linear", add_inverts=True)
    rng = np.random.default_rng(1)
    states = [_random_invertible_gf2(n, rng) for _ in range(B)]
    specs = [
        LinearFunctionSpecEnv(n, 1, gs, 2, 128, add_inverts=True, add_perms=False)
        for _ in range(B)
    ]
    run_trace(core, specs, states, T=30, seed=11)


def test_clifford_env_trace_matches_spec():
    n, B = 3, 8
    gs = line_gateset(["H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"], n)
    core = MatrixEnvCore(n, gs, "clifford", add_inverts=True)
    # random reachable clifford states: scramble via spec env
    specs = []
    states = []
    rng = np.random.default_rng(2)
    for _ in range(B):
        s = CliffordSpecEnv(n, 12, gs, 2, 128, add_inverts=False, add_perms=False,
                            rng=np.random.default_rng(int(rng.integers(1 << 31))))
        s.reset()
        states.append(s.get_state().copy())
        spec = CliffordSpecEnv(n, 1, gs, 2, 128, add_inverts=True, add_perms=False)
        specs.append(spec)
    run_trace(core, specs, states, T=30, seed=13)


def test_clifford_env_27q_trace():
    """The 54x54 two-word packing path (BASELINE heavy-hex size)."""
    n, B = 27, 4
    gs = line_gateset(["H", "S", "CX", "SWAP"], n)
    core = MatrixEnvCore(n, gs, "clifford", add_inverts=True)
    rng = np.random.default_rng(3)
    specs, states = [], []
    for _ in range(B):
        s = CliffordSpecEnv(n, 40, gs, 2, 128, add_inverts=False, add_perms=False,
                            rng=np.random.default_rng(int(rng.integers(1 << 31))))
        s.reset()
        states.append(s.get_state().copy())
        specs.append(CliffordSpecEnv(n, 1, gs, 2, 128, add_inverts=True,
                                     add_perms=False))
    run_trace(core, specs, states, T=12, seed=17)


def test_permutation_env_trace_matches_spec():
    n, B = 6, 8
    gs = [("SWAP", (i, i + 1)) for i in range(n - 1)] + [("SWAP", (0, 2))]
    core = PermutationEnvCore(n, gs, add_inverts=True)
    rng = np.random.default_rng(4)
    states = [rng.permutation(n).astype(np.int32) for _ in range(B)]
    specs = [
        PermutationSpecEnv(n, 1, gs, 2, 128, add_inverts=True, add_perms=False)
        for _ in range(B)
    ]

    # permutation cores have their own state fields; drive manually
    state = core.set_state(np.stack(states))
    for s, st in zip(specs, states):
        s.set_state(st.tolist())
    key = jax.random.key(21)
    step = jax.jit(core.step)
    for t in range(30):
        actions = rng.integers(0, core.num_actions, size=B)
        flips = rng.random(B) < 0.5
        was_final = np.array([s.is_final() for s in specs])
        prev = state
        key, sub = jax.random.split(key)
        state = step(state, jnp.asarray(actions), sub,
                     invert_override=jnp.asarray(flips))
        done = jnp.asarray(was_final)
        state = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape(done.shape + (1,) * (new.ndim - 1)), old, new
            ),
            state, prev,
        )
        for b, s in enumerate(specs):
            if not was_final[b]:
                s.step(int(actions[b]), invert=bool(flips[b]))
        compare(core, state, specs)
        got_s = np.asarray(core.perm_vector(state))
        for b, s in enumerate(specs):
            assert np.array_equal(got_s[b], s.get_state()), f"lane {b} perm"


def test_reset_scramble_override_matches_spec():
    n, B = 4, 5
    gs = line_gateset(["CX", "SWAP"], n)
    core = MatrixEnvCore(n, gs, "linear", add_inverts=False)
    rng = np.random.default_rng(9)
    diff = 7
    scrambles = rng.integers(0, len(gs), size=(B, diff)).astype(np.int32)
    state = core.reset(jax.random.key(0), B, diff,
                       scramble_override=jnp.asarray(scrambles))
    dense = np.asarray(core.dense(state))
    for b in range(B):
        s = LinearFunctionSpecEnv(n, diff, gs, 2, 128, add_inverts=False,
                                  add_perms=False)
        s.reset(scramble_actions=scrambles[b])
        assert np.array_equal(dense[b], s._dense_obs())
        assert np.asarray(state.depth)[b] == s.depth


def test_observe_and_masks():
    n = 4
    gs = line_gateset(["CX"], n)
    core = MatrixEnvCore(n, gs, "linear", add_inverts=False)
    state = core.reset(jax.random.key(0), 3, 0)
    obs = np.asarray(core.observe(state))
    assert obs.shape == (3, n, n)
    assert np.array_equal(obs[0], np.eye(n))
    assert np.asarray(state.success).all()
    m = np.asarray(core.masks(state))
    assert m.shape == (3, len(gs)) and not m.any()
