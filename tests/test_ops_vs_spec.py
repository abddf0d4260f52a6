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
        if core.track_layers:
            assert max_g[b] + 1 == s.metrics.n_layers
            assert max_c[b] + 1 == s.metrics.n_layers_cnots
        else:
            # layer tracking elided (both layer weights zero): fields must
            # stay frozen at their reset value, reward still bit-exact
            assert max_g[b] == -1 and max_c[b] == -1
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


# default weights elide layer tracking (track_layers=False); the layered
# variant pins the full running-max machinery against the spec twin
_LAYERED = {"n_layers": 0.25, "n_layers_cnots": 0.05}


@pytest.mark.parametrize("mw", [None, _LAYERED])
def test_linear_env_trace_matches_spec(mw):
    n, B = 5, 8
    gs = line_gateset(["CX", "SWAP"], n)
    core = MatrixEnvCore(n, gs, "linear", add_inverts=True,
                         metrics_weights=mw)
    assert core.track_layers == (mw is not None)
    rng = np.random.default_rng(1)
    states = [_random_invertible_gf2(n, rng) for _ in range(B)]
    specs = [
        LinearFunctionSpecEnv(n, 1, gs, 2, 128, metrics_weights=mw,
                              add_inverts=True, add_perms=False)
        for _ in range(B)
    ]
    run_trace(core, specs, states, T=30, seed=11)


@pytest.mark.parametrize("mw", [None, _LAYERED])
def test_clifford_env_trace_matches_spec(mw):
    n, B = 3, 8
    gs = line_gateset(["H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"], n)
    core = MatrixEnvCore(n, gs, "clifford", add_inverts=True,
                         metrics_weights=mw)
    # random reachable clifford states: scramble via spec env
    specs = []
    states = []
    rng = np.random.default_rng(2)
    for _ in range(B):
        s = CliffordSpecEnv(n, 12, gs, 2, 128, add_inverts=False, add_perms=False,
                            rng=np.random.default_rng(int(rng.integers(1 << 31))))
        s.reset()
        states.append(s.get_state().copy())
        spec = CliffordSpecEnv(n, 1, gs, 2, 128, metrics_weights=mw,
                               add_inverts=True, add_perms=False)
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


def test_bitpack_matches_dense_representation():
    """Both state representations (dense int8 / bitpacked uint32) produce
    identical episodes given identical injected randomness."""
    from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore

    gateset = []
    edges = [(i, i + 1) for i in range(26)]
    for name in ("H", "S", "Sdg", "SX", "SXdg"):
        gateset += [(name, [q]) for q in range(27)]
    for name in ("CX", "CZ", "SWAP"):
        gateset += [(name, list(e)) for e in edges]
    mk = lambda bp: MatrixEnvCore(27, gateset, "clifford", max_depth=64,
                                  bitpack=bp)
    cd, cb = mk(False), mk(True)
    assert not cd.bitpack and cb.bitpack
    B = 16
    key = jax.random.key(0)
    s1 = jax.jit(cd.reset, static_argnums=(1, 2))(key, B, 6)
    s2 = jax.jit(cb.reset, static_argnums=(1, 2))(key, B, 6)
    st1, st2 = jax.jit(cd.step), jax.jit(cb.step)
    rng = np.random.default_rng(1)
    for t in range(30):
        act = jnp.asarray(rng.integers(0, cd.num_actions, B), jnp.int32)
        kk = jax.random.key(100 + t)
        fl = jnp.asarray(rng.integers(0, 2, B).astype(bool))
        s1 = st1(s1, act, kk, invert_override=fl)
        s2 = st2(s2, act, kk, invert_override=fl)
        assert np.array_equal(np.asarray(cd.dense(s1)),
                              np.asarray(cb.dense(s2))), t
    assert np.array_equal(np.asarray(s1.success), np.asarray(s2.success))
    assert np.allclose(np.asarray(s1.reward), np.asarray(s2.reward))


def test_bitpack_is_the_default_at_every_dim():
    """Round 4: bitpacked uint32 is the production default at every dim
    (measured 1.08-2.2x over dense int8 once the consolidated gather made
    the step bandwidth-bound; docs/PERF.md). Dense remains opt-in."""
    from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore

    gs5 = [("SWAP", [i, i + 1]) for i in range(4)]
    assert MatrixEnvCore(5, gs5, "permutation").bitpack          # dim 5
    assert MatrixEnvCore(5, gs5, "clifford").bitpack             # dim 10
    assert not MatrixEnvCore(5, gs5, "linear", bitpack=False).bitpack


def test_pallas_metrics_matches_xla():
    """The fused Pallas metrics kernel (interpret mode) matches the XLA
    lowering bit-for-bit (kept as a measured-slower-on-v5e baseline)."""
    from qiskit_gym_tpu.ops.matrix_env import MatrixEnvCore
    from qiskit_gym_tpu.ops.pallas_metrics import metrics_update_pallas

    gateset = [("CX", [0, 1]), ("CX", [1, 0]), ("SWAP", [0, 1]),
               ("CZ", [0, 1]), ("H", [0]), ("S", [1])]
    # nonzero layer weights: the Pallas kernel always tracks layers, so the
    # XLA side must run its tracked path for the comparison
    core = MatrixEnvCore(2, gateset, "clifford", metrics_weights=_LAYERED)
    s = core.reset(jax.random.key(0), 16, 4)
    rng = np.random.default_rng(0)
    for t in range(6):
        s = core.step(s, jnp.asarray(rng.integers(0, 6, 16)),
                      jax.random.key(t))
    act = jnp.asarray(rng.integers(0, 7, 16))  # includes the noop index
    s1, p1 = core._metrics_update_xla(s, act)
    scal = jnp.stack([s.max_g, s.max_c, s.n_cnots, s.n_gates,
                      core.mtype[act], core.mq1[act], core.mq2[act],
                      (act == core.noop_action).astype(jnp.int32)], axis=1)
    g, c, sc, pen = metrics_update_pallas(s.last_g, s.last_c, scal,
                                          core.weights_static, interpret=True)
    assert np.array_equal(np.asarray(g), np.asarray(s1.last_g))
    assert np.array_equal(np.asarray(c), np.asarray(s1.last_c))
    assert np.array_equal(np.asarray(sc[:, 0]), np.asarray(s1.max_g))
    assert np.array_equal(np.asarray(sc[:, 1]), np.asarray(s1.max_c))
    assert np.array_equal(np.asarray(sc[:, 2]), np.asarray(s1.n_cnots))
    assert np.array_equal(np.asarray(sc[:, 3]), np.asarray(s1.n_gates))
    assert np.allclose(np.asarray(pen), np.asarray(p1))


def test_gf2_factor_fuzz():
    """gf2_factor reproduces random GF(2) matrices with minimal rank."""
    from qiskit_gym_tpu.ops.matrix_env import gf2_factor

    rng = np.random.default_rng(7)
    for trial in range(30):
        D = int(rng.integers(1, 40))
        r_target = int(rng.integers(0, min(D, 6) + 1))
        # random rank-<=r matrix: sum of r outer products
        M = np.zeros((D, D), np.uint8)
        for _ in range(r_target):
            u = rng.integers(0, 2, D).astype(np.uint8)
            v = rng.integers(0, 2, D).astype(np.uint8)
            M ^= np.outer(u, v) & 1
        U, S = gf2_factor(M)
        assert np.array_equal((U.astype(np.int64) @ S) % 2, M)
        # exact GF(2) rank via elimination on a copy
        W = M.astype(np.int64).copy() % 2
        rank = 0
        for col in range(D):
            piv = None
            for row in range(rank, D):
                if W[row, col]:
                    piv = row
                    break
            if piv is None:
                continue
            W[[rank, piv]] = W[[piv, rank]]
            for row in range(D):
                if row != rank and W[row, col]:
                    W[row] ^= W[rank]
            rank += 1
        assert U.shape[1] == rank, (trial, U.shape, rank)


def test_packed_apply_matches_dense_fuzz():
    """packed_apply_left/right agree with dense GF(2) matmul on random
    rank-k updates and random packed states."""
    import jax.numpy as jnp

    from qiskit_gym_tpu.ops.matrix_env import (
        gf2_factor, pack_rows, pack_term_tables, packed_apply_left,
        packed_apply_right, unpack_rows)

    rng = np.random.default_rng(11)
    for trial in range(10):
        D = int(rng.integers(33, 70))  # force W = 2+ word groups
        W = (D + 31) // 32
        B = 4
        # a few random low-rank GF(2) "gates"
        Us, Ss, mats = [], [], []
        for _ in range(3):
            M = np.zeros((D, D), np.uint8)
            for _ in range(int(rng.integers(0, 3))):
                M ^= np.outer(rng.integers(0, 2, D),
                              rng.integers(0, 2, D)).astype(np.uint8) & 1
            U, S = gf2_factor(M)
            Us.append(U)
            Ss.append(S)
            mats.append((np.eye(D, dtype=np.uint8) + M) % 2)
        U32, S32, Ulm, Slm = pack_term_tables(Us, Ss, D)
        a_dense = rng.integers(0, 2, (B, D, D)).astype(np.uint8)
        a = jnp.asarray(pack_rows(a_dense, W).reshape(B, W * D))
        act = jnp.asarray(rng.integers(0, 3, B))
        got_l = unpack_rows(
            packed_apply_left(jnp.asarray(U32)[act], jnp.asarray(S32)[act],
                              a, W, D), W, D, D)
        got_r = unpack_rows(
            packed_apply_right(jnp.asarray(Ulm)[act], jnp.asarray(Slm)[act],
                               a, W, D), W, D, D)
        for b in range(B):
            G = mats[int(act[b])].astype(np.int64)
            want_l = (G @ a_dense[b]) % 2
            want_r = (a_dense[b] @ G) % 2
            assert np.array_equal(np.asarray(got_l[b]), want_l), trial
            assert np.array_equal(np.asarray(got_r[b]), want_r), trial


# ------------------------------------------------- fat-table decode exactness


@pytest.mark.parametrize("kind,names,n", [
    ("permutation", ["SWAP"], 5),
    ("linear", ["CX", "SWAP"], 5),
    ("clifford", ["H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"], 3),
    ("clifford", ["H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"], 17),
])
def test_fat_table_decode_exact(kind, names, n):
    """The consolidated per-action f32 table must decode bit-for-bit back to
    every original table (the step's only source of per-action data)."""
    core = MatrixEnvCore(n, line_gateset(names, n), kind)
    acts = jnp.arange(core.num_actions + 1)
    mtype, q1, q2, terms = jax.jit(core._decode_action_tables)(acts)
    assert np.array_equal(np.asarray(mtype), np.asarray(core.mtype))
    assert np.array_equal(np.asarray(q1), np.asarray(core.mq1))
    assert np.array_equal(np.asarray(q2), np.asarray(core.mq2))
    if core.bitpack:
        U32, S32, Ulm, Slm = terms
        assert np.array_equal(np.asarray(U32), np.asarray(core.U32))
        assert np.array_equal(np.asarray(S32), np.asarray(core.S32))
        assert np.array_equal(np.asarray(Ulm), np.asarray(core.Ulm))
        assert np.array_equal(np.asarray(Slm), np.asarray(core.Slm))
    else:
        Ug, Sg = terms
        assert np.array_equal(np.asarray(Ug), np.asarray(core.Ug))
        assert np.array_equal(np.asarray(Sg), np.asarray(core.Sg))


def test_fat_table_decode_exact_pauli():
    from qiskit_gym_tpu.ops.pauli import PauliEnvCore

    names = ["H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"]
    core = PauliEnvCore(4, line_gateset(names, 4))
    acts = jnp.arange(core.num_actions + 1)
    mtype, q1, q2, (U32, S32, pt, p1, p2) = jax.jit(
        core._decode_action_tables)(acts)
    assert np.array_equal(np.asarray(mtype), np.asarray(core.mtype))
    assert np.array_equal(np.asarray(q1), np.asarray(core.mq1))
    assert np.array_equal(np.asarray(q2), np.asarray(core.mq2))
    assert np.array_equal(np.asarray(U32), np.asarray(core.U32))
    assert np.array_equal(np.asarray(S32), np.asarray(core.S32))
    assert np.array_equal(np.asarray(pt), np.asarray(core.ptype))
    assert np.array_equal(np.asarray(p1), np.asarray(core.pq1))
    assert np.array_equal(np.asarray(p2), np.asarray(core.pq2))
