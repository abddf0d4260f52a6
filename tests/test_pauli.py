"""Pauli-network env tests: batched core vs spec traces, and the full
synthesis round-trip checked against the statevector oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.quantum import (
    Circuit,
    allclose_up_to_global_phase,
    circuit_unitary,
)
from qiskit_gym_tpu.rl import BasicPolicyConfig, EvalConfig, PPOConfig, RLSynthesis
from qiskit_gym_tpu.spec import PauliSpecEnv

LINE_3 = [(0, 1), (1, 2)]


def make_gym(n=3, **kw):
    kw.setdefault("max_depth", 24)
    kw.setdefault("max_rotations", 4)
    return PauliGym.from_coupling_map(
        [(i, i + 1) for i in range(n - 1)],
        basis_gates=("H", "S", "Sdg", "SX", "SXdg", "CX", "CZ", "SWAP"),
        **kw,
    )


def encoded_target(n=3, seed=0):
    """A random Clifford+rotations circuit and its encoded state."""
    rng = np.random.default_rng(seed)
    qc = Circuit(n)
    gates_1q = ["h", "s", "sdg", "sx"]
    for _ in range(6):
        r = rng.random()
        if r < 0.4 and n > 1:
            a, b = rng.choice(n, 2, replace=False)
            qc.cx(int(a), int(b))
        elif r < 0.7:
            qc.append(gates_1q[rng.integers(4)], (int(rng.integers(n)),))
        else:
            axis = ["rx", "ry", "rz"][rng.integers(3)]
            qc.append(axis, (int(rng.integers(n)),),
                      (float(rng.uniform(-2, 2)),))
    if not any(g[0] in ("rx", "ry", "rz") for g in qc):
        qc.rz(0.7, 0)
    return qc


# ------------------------------------------------------------- trace vs spec


def test_pauli_core_trace_matches_spec():
    gym = make_gym(3, add_perms=False)
    core = gym.core
    rng = np.random.default_rng(5)
    for seed in range(4):
        target = encoded_target(3, seed=seed + 10)
        enc = gym.get_state(target)
        spec = PauliSpecEnv(
            3, 1, gym.gateset, 2, 24, max_rotations=4, add_perms=False
        )
        spec.set_state(list(enc))
        state = gym.make_solve_state(enc, 1)

        step = jax.jit(core.step)
        key = jax.random.key(seed)
        for t in range(16):
            if spec.is_final():
                break
            a = int(rng.integers(core.num_actions))
            spec.step(a)
            key, sub = jax.random.split(key)
            state = step(state, jnp.asarray([a]), sub)

            # dense obs must match exactly (identity perm)
            want = np.zeros(np.prod(spec.obs_shape()), dtype=np.int8)
            want[spec.observe(perm_idx=0)] = 1
            want = want.reshape(spec.obs_shape())
            got = np.asarray(core.dense(state))[0]
            assert np.array_equal(got, want), f"seed {seed} step {t} obs"
            assert bool(np.asarray(state.success)[0]) == spec.success
            assert int(np.asarray(state.depth)[0]) == spec.depth
            assert abs(float(np.asarray(state.reward)[0]) - spec.reward()) < 1e-5, (
                seed, t)


def test_pauli_perm_translation_consistent():
    """With symmetry on, stepping with a policy-frame action must equal the
    spec env driven with the same perm_idx + action."""
    gym = make_gym(3, add_perms=True)
    core = gym.core
    assert core.num_perms == len(gym.spec.qubit_perms)
    target = encoded_target(3, seed=3)
    enc = gym.get_state(target)
    spec = PauliSpecEnv(3, 1, gym.gateset, 2, 24, max_rotations=4,
                        add_perms=True)
    spec.set_state(list(enc))
    state = gym.make_solve_state(enc, 1)
    rng = np.random.default_rng(0)
    step = jax.jit(core.step)
    key = jax.random.key(9)
    for t in range(8):
        if spec.is_final():
            break
        pidx = int(np.asarray(state.perm_idx)[0])
        a = int(rng.integers(core.num_actions))
        spec.observe(perm_idx=pidx)       # aligns spec's active perm
        spec.step(a)
        key, sub = jax.random.split(key)
        state = step(state, jnp.asarray([a]), sub)
        want = np.zeros(np.prod(spec.obs_shape()), dtype=np.int8)
        want[spec.observe(perm_idx=0)] = 1
        got = np.asarray(core.dense(
            state._replace(perm_idx=jnp.zeros(1, jnp.int32))))[0]
        assert np.array_equal(got, want.reshape(spec.obs_shape())), t


def test_pauli_reset_structure():
    gym = make_gym(3)
    core = gym.core
    state = jax.jit(core.reset, static_argnums=(1, 2))(
        jax.random.key(0), 64, 24
    )
    # rotation bits are packed uint32 [B, R, Wn]; unpack to [B, R, n]
    from qiskit_gym_tpu.ops.pauli import unpack_bits_lastdim
    active = np.asarray(state.active)
    rx = np.asarray(unpack_bits_lastdim(state.rx, core.num_qubits))
    rz = np.asarray(unpack_bits_lastdim(state.rz, core.num_qubits))
    # every active rotation is a valid non-identity Pauli
    w = ((rx | rz).sum(axis=2))
    assert (w[active] >= 1).all()
    # active rotations are non-trivial (weight>1) or blocked by an earlier one
    depth = np.asarray(state.depth)
    assert (depth == np.minimum(2 * 24, core.max_depth)).all()
    # some lanes should have rotations at difficulty 24 (24//16 = 1 budget
    # under the gym-layer default pauli_diff_scale=16)
    assert active.any()


def test_pauli_gym_obs_shape_and_json():
    gym = make_gym(3)
    assert gym.obs_shape() == [6, 6 + 4]
    blob = gym.to_json()
    gym2 = PauliGym.from_json(blob)
    assert gym2.gateset == gym.gateset
    assert gym2.config["max_rotations"] == 4


def test_pauli_gym_diff_scale_default_matches_reference():
    """The Python gym layer defaults pauli_diff_scale to 16 (reference
    envs/synthesis.py:388), overriding the native-core default of 8
    (reference rust/src/envs/pauli.rs:758-775); explicit values pass
    through to both the spec env and the batched core."""
    gym = make_gym(3)
    assert gym.spec.pauli_diff_scale == 16
    assert gym.core.pauli_diff_scale == 16
    assert PauliSpecEnv(num_qubits=2, gateset=[("H", (0,)), ("CX", (0, 1))],
                        difficulty=1, depth_slope=2, max_depth=16) \
        .pauli_diff_scale == 8
    gym8 = make_gym(3, pauli_diff_scale=8)
    assert gym8.spec.pauli_diff_scale == 8
    assert gym8.core.pauli_diff_scale == 8
    assert PauliGym.from_json(gym8.to_json()).core.pauli_diff_scale == 8


# -------------------------------------------------------- synthesis roundtrip


def _try_synth_roundtrip(target, gym, rls, searches=256):
    out = rls.synth(target, num_searches=searches)
    if out is None:
        return None
    u_out = circuit_unitary(out)
    u_tgt = circuit_unitary(target)
    return allclose_up_to_global_phase(u_out, u_tgt)


def test_pauli_synth_unitary_exact():
    """End-to-end: encode a Clifford+rotation circuit, solve with random
    search, rebuild with rotation decoding + phase correction, compare
    unitaries. Exercises every convention (transposed cnot, rotation phases,
    Clifford correction)."""
    gym = make_gym(2, max_depth=12, max_rotations=3)
    cfg = PPOConfig(num_episodes=8, num_epochs=1,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=4)})
    rls = RLSynthesis(gym, cfg, BasicPolicyConfig(embedding_size=32,
                                                  common_layers=[16]))
    hits = 0
    for seed in range(8):
        target = Circuit(2)
        if seed % 2 == 0:
            target.h(0).cx(0, 1).rz(0.5 + 0.1 * seed, 1)
        else:
            target.rx(0.3 * (seed + 1), 0).s(1).cx(1, 0)
        ok = _try_synth_roundtrip(target, gym, rls, searches=512)
        if ok is None:
            continue
        hits += 1
        assert ok, f"seed {seed}: synthesized unitary mismatch"
    assert hits > 0, "no Pauli synthesis succeeded (stochastic search)"


def test_native_checkpoint_roundtrip(tmp_path):
    """flax-msgpack checkpoint format round-trips (non-.pt extension)."""
    import jax

    from qiskit_gym_tpu.utils.serialization import load_params, save_params
    from qiskit_gym_tpu.models import make_policy

    policy = make_policy("qiskit_gym_tpu.models.BasicPolicy", (3, 3), 4,
                         {"embedding_size": 8, "common_layers": [4]})
    params = policy.init(jax.random.key(0))
    path = str(tmp_path / "ckpt.msgpack")
    save_params(params, path)
    loaded = load_params(path, template=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_pauli_ppo_learn_smoke():
    """PauliGym trains end-to-end through the batched core (2 iterations)."""
    from qiskit_gym_tpu.rl import RLSynthesis

    gym = make_gym(3, max_depth=16, max_rotations=3)
    cfg = PPOConfig(num_episodes=16, num_epochs=2,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=8)})
    rls = RLSynthesis(gym, cfg, BasicPolicyConfig(embedding_size=32,
                                                  common_layers=[16]))
    rls.learn(initial_difficulty=16, num_iterations=2)
    # difficulty 16 -> pauli budget 1: rotations likely present; train ran
    assert rls.algorithm.iteration == 2


def test_pauli_tuple_input_with_params():
    """(Clifford, rotations, params) tuple inputs synthesize parametric
    rotations: the reconstructed circuit must match the equivalent
    circuit-input synthesis up to global phase."""
    from qiskit_gym_tpu.envs.synthesis import _parse_pauli_circuit
    from qiskit_gym_tpu.quantum import Clifford

    gym = make_gym(2, max_depth=12, max_rotations=3)
    cfg = PPOConfig(num_episodes=8, num_epochs=1,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=4)})
    rls = RLSynthesis(gym, cfg, BasicPolicyConfig(embedding_size=32,
                                                  common_layers=[16]))
    target = Circuit(2)
    target.h(0).cx(0, 1).rz(0.8, 1)
    cliff, rotations, params = _parse_pauli_circuit(target)
    # tuple input encodes the same state as the circuit input (reference
    # adjoint convention: circuit inputs are adjointed during parsing)
    enc_circ = gym.get_state(target)
    enc_tuple = gym.get_state((cliff.adjoint(), rotations, params))
    assert enc_circ == enc_tuple
    assert gym._rotation_params == params

    hit = False
    for seed in range(4):
        out = rls.synth((cliff.adjoint(), rotations, params),
                        num_searches=512)
        if out is None:
            continue
        hit = True
        # rotations must carry the supplied angles (no phase-correction
        # block exists for tuple inputs, so compare rotation gates only)
        rots = [g for g in out if g[0] in ("rx", "ry", "rz")]
        assert rots, "no parametric rotations reconstructed"
        assert all(abs(abs(g[2][0]) - 0.8) < 1e-9 for g in rots)
        break
    assert hit, "no tuple-input synthesis succeeded (stochastic search)"


def test_pauli_27q_rotation_episode_constructively_solvable():
    """A 27q rotation episode is solvable within the known recipe: undo the
    scramble (inverse actions in reverse), one CX to sweep an adjacent-pair
    rotation, one CX to restore the tableau. Guards the curriculum's
    rotation regime against encoding/convention regressions at scale (the
    training wall there is exploration difficulty, not unsolvability)."""
    import copy

    import numpy as np

    from qiskit_gym_tpu.spec import PauliSpecEnv

    n = 27
    edges = [(i, i + 1) for i in range(n - 1)] + \
            [(i + 1, i) for i in range(n - 1)]
    gateset = [("H", (q,)) for q in range(n)] + \
              [("S", (q,)) for q in range(n)] + \
              [("Sdg", (q,)) for q in range(n)] + \
              [("CX", e) for e in edges]
    env = PauliSpecEnv(num_qubits=n, gateset=gateset, difficulty=64,
                       depth_slope=2, max_depth=128, max_rotations=5,
                       add_perms=False)
    aidx = {g: i for i, g in enumerate(gateset)}

    lab = ["I"] * n
    lab[n - 1 - 3] = "X"   # qiskit little-endian labels: X on qubits 3, 4
    lab[n - 1 - 4] = "X"
    env.reset(rotations=["".join(lab)],
              tableau=np.eye(2 * n, dtype=np.int64).reshape(-1))
    assert not env.solved()

    scr = [("H", (3,)), ("CX", (3, 4)), ("S", (10,)), ("CX", (7, 8))]
    for g in scr:
        env.step(aidx[g])
    inv = [("CX", (7, 8)), ("Sdg", (10,)), ("CX", (3, 4)), ("H", (3,))]
    for g in inv:
        env.step(aidx[g])
    assert env.network.active_rotation_indices() == [0]

    for pair in [(3, 4), (4, 3)]:   # either CX direction works for XX
        e2 = copy.deepcopy(env)
        e2.step(aidx[("CX", pair)])
        assert e2.network.active_rotation_indices() == []
        e2.step(aidx[("CX", pair)])
        assert e2.solved() and e2.success


def test_pauli_reset_path_episode_constructively_solvable():
    """A reset-generated episode (injected scramble + rotation through the
    reset test hooks) is solved by the evolution-aware recipe: undo the
    scramble (row-op CX(a,b) inverts via the CX(b,a) ACTION; those actions
    also evolve the rotation), re-align the rotation axis, sweep with a CX,
    restore. Exercises the batched core's reset path end to end — the
    training distribution, not set_state."""
    n = 7
    edges = [(i, i + 1) for i in range(n - 1)] + \
            [(i + 1, i) for i in range(n - 1)]
    gym = PauliGym.from_coupling_map(edges,
                                     basis_gates=("H", "S", "Sdg", "CX"),
                                     max_rotations=4, add_perms=False)
    core = gym.core
    aidx = {g: i for i, g in enumerate(gym.gateset)}
    vp = list(core.valid_pairs)
    ncx = core.n_scramble_cx

    # scramble row-ops: CX(5,6), H(3), S(1), CX(1,2)
    scr = [vp.index((5, 6)), ncx + 3, ncx + n + 1, vp.index((1, 2))]
    RT = core.RT
    rx = np.zeros((1, RT, n), np.int8)
    rz = np.zeros((1, RT, n), np.int8)
    ph = np.zeros((1, RT), np.int8)
    valid = np.zeros((1, RT), bool)
    rx[0, 0, 3] = rx[0, 0, 4] = 1          # XX rotation on qubits 3, 4
    valid[0, 0] = True

    state = core.reset(jax.random.key(0), 1, 4,
                       scramble_override=jnp.asarray([scr], jnp.int32),
                       rotations_override=(rx, rz, ph, valid))
    assert not bool(np.asarray(state.success)[0])
    assert int(np.asarray(state.active).sum()) == 1

    step = jax.jit(core.step)
    key = jax.random.key(1)
    seq = [("CX", (2, 1)), ("Sdg", (1,)), ("H", (3,)), ("CX", (6, 5)),
           ("H", (3,)),                     # rotation Z3X4 -> X3X4
           ("CX", (3, 4)),                  # weight 1 -> swept
           ("CX", (3, 4)), ("H", (3,))]    # restore the tableau
    for g in seq:
        key, sub = jax.random.split(key)
        state = step(state, jnp.asarray([aidx[g]]), sub)
    assert bool(np.asarray(state.success)[0])
    assert int(np.asarray(state.active).sum()) == 0


def test_reset_difficulty_zero_is_identity():
    """Static difficulty 0 must reset to the solved identity tableau (the
    K=max(K,1) sample-shape clamp once applied a real scramble op)."""
    import jax

    from qiskit_gym_tpu.envs.synthesis import PauliGym

    env = PauliGym.from_coupling_map([(0, 1), (1, 0), (1, 2), (2, 1)])
    state = env.core.reset(jax.random.key(0), 8, 0)
    assert bool(np.asarray(state.success).all())


def test_noop_action_survives_translation():
    """The noop action (== num_actions) must pass through translate_action
    untouched — the [P, A] act_perms gather would clamp it to the last real
    gate for envs with a nontrivial automorphism group."""
    import jax
    import jax.numpy as jnp

    from qiskit_gym_tpu.envs.synthesis import PauliGym

    env = PauliGym.from_coupling_map([(0, 1), (1, 0), (1, 2), (2, 1)])
    core = env.core
    assert core.num_perms > 1
    state = core.reset(jax.random.key(1), 4, 2)
    noop = jnp.full(4, core.noop_action, jnp.int32)
    out = np.asarray(core.translate_action(state, noop))
    assert (out == core.noop_action).all()


def test_primitive_depth_specializes_per_gateset():
    """The fused Sdg primitive keeps every gate at <= 3 slots (SXdg was 9
    as (HSH)^3), and restricted gatesets shrink the masked primitive loop
    further — the rotation loop's per-step cost scales with max_prims."""
    full = make_gym(3).core
    assert full.max_prims == 3                      # SXdg = H Sdg H
    assert full.cleanup_slots == [0, 1, 2]          # SWAP's three CNOTs
    dense = PauliGym.from_coupling_map(
        LINE_3, basis_gates=("H", "S", "Sdg", "CX"), max_depth=24,
        max_rotations=4).core
    assert dense.max_prims == 1                     # Sdg fused to one slot
    assert dense.cleanup_slots == [0]


def test_ext_cap_matches_uncapped_spec_distribution():
    """EXT_CAP=16 (ops/pauli.py _generate_rotations) statically bounds the
    reference's UNBOUNDED extension loop (pauli.rs:147-157). Each iteration
    breaks w.p. num_qubits_decay first, so P(>16 extensions) ~ (1-decay)^16
    ~ 1.5e-5 at the 0.5 default — the cap must be distributionally
    invisible. Pin it: rotation support sizes and rotations-per-reset from
    the capped device generator match the uncapped numpy spec twin."""
    gym = make_gym(n=9, max_depth=64)
    core, spec = gym.core, gym.spec
    assert spec.num_qubits_decay == 0.5
    diff = 24  # deep budget: many extension opportunities per rotation
    B = 2048

    rx, rz, rphase, valid = jax.jit(
        lambda k: core._generate_rotations(k, B, jnp.full(B, diff))
    )(jax.random.key(0))
    support = np.asarray(
        jax.lax.population_count(rx | rz).sum(-1))[np.asarray(valid)]
    n_rot = np.asarray(valid).sum(axis=1)

    spec.rng = np.random.default_rng(7)
    s_support, s_nrot = [], []
    for _ in range(B):
        rots = spec._generate_rotations(diff)
        s_nrot.append(len(rots))
        s_support += [sum(c != "I" for c in r) for r in rots]
    s_support = np.asarray(s_support)

    assert abs(support.mean() - s_support.mean()) < 0.2, (
        support.mean(), s_support.mean())
    assert abs(support.std() - s_support.std()) < 0.3
    assert abs(n_rot.mean() - np.mean(s_nrot)) < 0.2
    # the cap itself can never be the binding constraint in practice:
    # supports needing >16 extensions would span >34 qubits
    assert support.max() <= 9
