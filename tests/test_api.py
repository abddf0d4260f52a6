"""End-to-end API tests: gyms, configs, RLSynthesis train/synth/save/load."""

import json
import os

import numpy as np
import pytest

from qiskit_gym_tpu.envs import (
    CliffordGym,
    LinearFunctionGym,
    PermutationGym,
    gym_adapter,
)
from qiskit_gym_tpu.quantum import (
    Circuit,
    Clifford,
    circuit_unitary,
    allclose_up_to_global_phase,
    linear_from_circuit,
    permutation_pattern,
)
from qiskit_gym_tpu.rl import (
    BasicPolicyConfig,
    EvalConfig,
    PPOConfig,
    RLSynthesis,
)

GRID_2x2 = [(0, 1), (0, 2), (1, 3), (2, 3)]
LINE_3 = [(0, 1), (1, 2)]


def small_ppo(num_episodes=32, **kw):
    return PPOConfig(
        num_episodes=num_episodes,
        num_epochs=2,
        evals={
            "ppo_deterministic": EvalConfig(num_episodes=16),
            "ppo_10": EvalConfig(num_episodes=8, deterministic=False,
                                 num_searches=4),
        },
        **kw,
    )


# ---------------------------------------------------------------------- gyms


def test_from_coupling_map_gateset_expansion():
    env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("H", "S", "CX"))
    names = [g[0] for g in env.gateset]
    assert names.count("H") == 3 and names.count("S") == 3
    assert names.count("CX") == 2  # one per (sorted) edge
    assert env.num_actions() == 8
    assert env.obs_shape() == [6, 6]


def test_from_coupling_map_rejects_bad_gates():
    with pytest.raises(ValueError):
        PermutationGym.from_coupling_map(LINE_3, basis_gates=("CX",))


def test_env_json_roundtrip():
    env = LinearFunctionGym.from_coupling_map(GRID_2x2)
    blob = json.loads(json.dumps(env.to_json()))
    env2 = LinearFunctionGym.from_json(blob)
    assert env2.gateset == env.gateset
    assert env2.config["max_depth"] == env.config["max_depth"]


def test_permutation_get_state_is_inverse():
    env = PermutationGym.from_coupling_map(LINE_3)
    pattern = [2, 0, 1]
    enc = env.get_state(pattern)
    assert enc == np.argsort(pattern).tolist()
    qc = Circuit(3).swap(0, 1).swap(1, 2)
    enc2 = env.get_state(qc)
    assert sorted(enc2) == [0, 1, 2]


def test_gymnasium_adapter():
    env = PermutationGym.from_coupling_map(LINE_3, difficulty=2)
    genv = gym_adapter(env)
    obs, info = genv.reset(seed=3)
    assert obs.shape == (3, 3) and set(np.unique(obs)) <= {0, 1}
    steps = 0
    done = obs is None
    while not genv._spec_env.is_final() and steps < 10:
        obs, reward, term, trunc, info = genv.step(genv.action_space.sample())
        steps += 1
    assert steps <= 4  # depth budget = 2*2


def test_vector_gymnasium_adapter():
    """Batched device-resident vector env: gymnasium.vector-style API with
    same-step autoreset; lanes that end return fresh observations and expose
    the closing observation via infos['final_observation']."""
    from qiskit_gym_tpu.envs import vector_gym_adapter

    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=8)
    venv = vector_gym_adapter(env, num_envs=32, difficulty=2, seed=5)
    obs, info = venv.reset()
    assert obs.shape == (32, 3, 3)
    assert set(np.unique(obs)) <= {0, 1}
    assert venv.single_action_space.n == env.num_actions()
    assert venv.masks().shape == (32, env.num_actions())

    rng = np.random.default_rng(0)
    saw_done = False
    for _ in range(10):
        actions = rng.integers(0, env.num_actions(), size=32)
        obs, reward, term, trunc, infos = venv.step(actions)
        assert obs.shape == (32, 3, 3)
        assert reward.shape == term.shape == trunc.shape == (32,)
        done = term | trunc
        if done.any():
            saw_done = True
            assert infos["final_observation"].shape == (32, 3, 3)
            assert (infos["_final_observation"] == done).all()
    # 10 random steps at depth budget 4 must have ended some episode
    assert saw_done

    # difficulty setter re-jits; subsequent episodes run at the new level
    venv.difficulty = 1
    obs, _ = venv.reset()
    assert obs.shape == (32, 3, 3)


# -------------------------------------------------------------------- configs


def test_ppo_config_json_matches_reference_schema():
    cfg = PPOConfig()
    j = cfg.to_json()
    assert j["collecting"]["lambda"] == 0.995
    assert set(j) == {"collecting", "training", "learning", "optimizer",
                      "evals", "logging"}
    rt = PPOConfig.from_json(j)
    assert rt.gae_lambda == cfg.gae_lambda
    assert rt.evals.keys() == cfg.evals.keys()


def test_load_reference_config_json():
    """Configs shipped with the reference load unchanged."""
    path = "/root/reference/examples/models/perm_square_3x3.json"
    if not os.path.exists(path):
        pytest.skip("reference artifacts unavailable")
    rls = RLSynthesis.from_config_json(path)
    assert rls.env.cls_name == "PermutationEnv"
    assert rls.env.num_actions() == 12
    assert rls.env.obs_shape() == [9, 9]


def test_load_reference_torch_checkpoint():
    path = "/root/reference/examples/models/perm_square_3x3"
    if not os.path.exists(path + ".json"):
        pytest.skip("reference artifacts unavailable")
    rls = RLSynthesis.from_config_json(path + ".json", path + ".pt")
    p = rls.algorithm.params["params"]
    assert p["embeddings"]["kernel"].shape == (81, 512)
    assert p["action_out"]["kernel"].shape == (256, 12)


# ----------------------------------------------------------- train and synth


def test_rlsynthesis_learn_and_synth_permutation(tmp_path):
    env = PermutationGym.from_coupling_map(GRID_2x2, max_depth=32)
    rls = RLSynthesis(env, small_ppo(), BasicPolicyConfig(embedding_size=64,
                                                          common_layers=[32]))
    rls.learn(initial_difficulty=1, num_iterations=3)

    # synthesize a 1-swap pattern; must round-trip
    pattern = [1, 0, 2, 3]
    out = rls.synth(pattern, num_searches=64)
    assert out is not None, "failed to synthesize a single-swap permutation"
    got = permutation_pattern(linear_from_circuit(out))
    assert got.tolist() == pattern

    # save / load roundtrip
    cfg_path = str(tmp_path / "cfg.json")
    mdl_path = str(tmp_path / "mdl.pt")
    rls.save(cfg_path, mdl_path)
    rls2 = RLSynthesis.from_config_json(cfg_path, mdl_path)
    out2 = rls2.synth(pattern, num_searches=64)
    assert out2 is not None
    assert permutation_pattern(linear_from_circuit(out2)).tolist() == pattern


def test_trained_with_provenance_round_trips(tmp_path):
    """`trained_with` must survive save()/from_config_json; a plain resave
    used to silently drop hand-added provenance notes from artifact jsons."""
    env = PermutationGym.from_coupling_map(GRID_2x2, max_depth=32)
    rls = RLSynthesis(env, small_ppo(), BasicPolicyConfig(embedding_size=64,
                                                          common_layers=[32]))
    # absent by default: the key must not appear at all
    p0 = str(tmp_path / "plain.json")
    rls.save(p0)
    assert "trained_with" not in json.load(open(p0))

    rls.trained_with = "PPO 3 iters on CPU; test provenance"
    p1 = str(tmp_path / "prov.json")
    rls.save(p1)
    assert json.load(open(p1))["trained_with"] == rls.trained_with
    rls2 = RLSynthesis.from_config_json(p1)
    assert rls2.trained_with == rls.trained_with
    # and a resave through the reloaded object keeps it
    p2 = str(tmp_path / "resave.json")
    rls2.save(p2)
    assert json.load(open(p2))["trained_with"] == rls.trained_with


def test_rlsynthesis_synth_clifford_phase_exact():
    env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("H", "S", "CX"),
                                        max_depth=24)
    rls = RLSynthesis(env, small_ppo(16), BasicPolicyConfig(embedding_size=64,
                                                            common_layers=[32]))
    # an untrained policy with enough random searches still solves tiny targets
    target = Circuit(3).h(0).cx(0, 1).s(1)
    out = rls.synth(target, num_searches=512)
    if out is None:
        pytest.skip("search did not find a tiny-depth solution (stochastic)")
    # phase repair must make the circuit EXACTLY equal (up to global phase)
    assert allclose_up_to_global_phase(circuit_unitary(out),
                                       circuit_unitary(target))


def test_rlsynthesis_synth_linear_function():
    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=24)
    rls = RLSynthesis(env, small_ppo(16), BasicPolicyConfig(embedding_size=64,
                                                            common_layers=[32]))
    target = Circuit(3).cx(0, 1).cx(1, 2)
    out = rls.synth(target, num_searches=512)
    if out is None:
        pytest.skip("search did not find a solution (stochastic)")
    assert np.array_equal(linear_from_circuit(out), linear_from_circuit(target))


def test_conv1d_policy_trains():
    from qiskit_gym_tpu.rl import Conv1dPolicyConfig

    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=16)
    rls = RLSynthesis(env, small_ppo(8),
                      Conv1dPolicyConfig(embedding_size=32, common_layers=[16]))
    rls.learn(initial_difficulty=1, num_iterations=1)
    assert rls.algorithm.iteration == 1


def test_top_level_exports():
    import qiskit_gym_tpu as q

    assert hasattr(q, "RLSynthesis") and hasattr(q, "PermutationGym")


def test_curriculum_advances():
    """PPO on a trivial env must pass the eval gate and advance difficulty."""
    env = PermutationGym.from_coupling_map(LINE_3, max_depth=16)
    cfg = PPOConfig(num_episodes=64, num_epochs=4,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=32)})
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=64,
                                                  common_layers=[32]))
    rls.learn(initial_difficulty=1, num_iterations=8)
    assert env.difficulty > 1, "curriculum never advanced on a 3-qubit line"
    # every gate pass snapshots the proven policy (artifact-safety: a later
    # hard-regime wall can degrade the live params at every difficulty)
    assert rls.algorithm.best_params is not None
    assert rls.algorithm.best_difficulty >= 1


def test_save_best_params(tmp_path):
    """save(best=True) writes the last-advance snapshot, not the live
    params; falls back to live params before any advance."""
    import jax

    from qiskit_gym_tpu.utils.serialization import load_params

    env = PermutationGym.from_coupling_map(LINE_3, max_depth=16)
    cfg = PPOConfig(num_episodes=8, num_epochs=1,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=4)})
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=16,
                                                  common_layers=[8]))
    # no advance yet -> best falls back to live
    rls.save(str(tmp_path / "c.json"), str(tmp_path / "m.pt"), best=True)
    got = load_params(str(tmp_path / "m.pt"))
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(rls.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # simulate an advance snapshot, then mutate live params
    rls.algorithm.best_params = rls.algorithm.params
    rls.algorithm.best_difficulty = 3
    rls.algorithm.params = jax.tree.map(lambda x: x + 1.0,
                                        rls.algorithm.params)
    rls.save(str(tmp_path / "c.json"), str(tmp_path / "m.pt"), best=True)
    got = load_params(str(tmp_path / "m.pt"))
    for a, b in zip(jax.tree.leaves(got),
                    jax.tree.leaves(rls.algorithm.best_params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_learn_writes_jsonl_metrics(tmp_path):
    """tb_path always yields a metrics.jsonl, with or without torch."""
    import json as _json

    from qiskit_gym_tpu.envs import PermutationGym
    from qiskit_gym_tpu.rl import RLSynthesis
    from qiskit_gym_tpu.rl.configs import (BasicPolicyConfig, EvalConfig,
                                           PPOConfig)

    env = PermutationGym.from_coupling_map([(0, 1), (1, 2)], max_depth=8,
                                           add_inverts=False)
    cfg = PPOConfig(num_episodes=8, num_epochs=1,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=4)})
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=16,
                                                  common_layers=[8]))
    run = str(tmp_path / "run")
    rls.learn(num_iterations=2, tb_path=run)
    # learn() flushes the buffered final row itself — no close() needed
    lines = [
        _json.loads(x)
        for x in open(run + "/metrics.jsonl").read().splitlines() if x
    ]
    assert len(lines) == 2
    assert {"step", "loss", "difficulty"} <= set(lines[0].keys())
    assert any(k.startswith("eval/") for k in lines[0])


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax directory checkpoints round-trip (sharding-aware format)."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    from qiskit_gym_tpu.models import make_policy
    from qiskit_gym_tpu.utils.serialization import load_params, save_params

    policy = make_policy("qiskit_gym_tpu.models.BasicPolicy", (3, 3), 4,
                         {"embedding_size": 8, "common_layers": [4]})
    params = policy.init(jax.random.key(0))
    path = str(tmp_path / "ckpt.orbax")
    save_params(params, path)
    loaded = load_params(path, template=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_training_state_resume_roundtrip(tmp_path):
    """Full training-state snapshots (params + Adam state + RNG + iteration +
    curriculum difficulty) restore into a freshly built algorithm and resume
    learning; the reference persists params only."""
    import jax

    def build():
        env = PermutationGym.from_coupling_map(GRID_2x2, max_depth=32)
        return RLSynthesis(env, small_ppo(), BasicPolicyConfig(
            embedding_size=16, common_layers=[8]))

    rls = build()
    rls.learn(initial_difficulty=2, num_iterations=2)
    path = str(tmp_path / "train_state.msgpack")
    rls.algorithm.save_training_state(path)

    rls2 = build()
    rls2.algorithm.restore_training_state(path)
    assert rls2.algorithm.iteration == 2
    assert rls2.env.difficulty == rls.env.difficulty
    for a, b in zip(jax.tree.leaves(rls.algorithm.params),
                    jax.tree.leaves(rls2.algorithm.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(rls.algorithm.opt_state),
                    jax.tree.leaves(rls2.algorithm.opt_state)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(
        np.asarray(jax.random.key_data(rls.algorithm.key)),
        np.asarray(jax.random.key_data(rls2.algorithm.key)))
    # resumed learning proceeds from the restored counter
    rls2.algorithm.learn(num_iterations=1)
    assert rls2.algorithm.iteration == 3


def test_conv1d_torch_roundtrip_identical_logits(tmp_path):
    """A Conv1d policy saved in the reference torch state-dict format
    re-imports with bit-identical logits/value (conv kernel layout
    [K, Cin, Cout] <-> torch [Cout, Cin, K] via the transpose in
    models/torch_io.py; the assumed kernel_size is pinned by the stored
    'conv.weight' shape)."""
    import jax

    from qiskit_gym_tpu.models import make_policy
    from qiskit_gym_tpu.models.torch_io import (load_torch_checkpoint,
                                                save_torch_checkpoint)
    from qiskit_gym_tpu.rl import Conv1dPolicyConfig

    env = LinearFunctionGym.from_coupling_map(LINE_3, max_depth=16)
    cfg = Conv1dPolicyConfig(embedding_size=33, common_layers=[16],
                             policy_layers=[8], value_layers=[8])
    policy = make_policy(cfg.policy_cls, env.obs_shape(), env.num_actions(),
                         cfg.to_json())
    params = policy.init(jax.random.key(3))
    # embedding_size=33 over a 3-column obs: flatten = 11*3 == embedding
    assert params["params"]["conv"]["kernel"].shape == (3, 3, 11)
    path = str(tmp_path / "conv.pt")
    save_torch_checkpoint(params, path)
    back = load_torch_checkpoint(path)
    obs = np.asarray(
        jax.random.bernoulli(jax.random.key(4), 0.5, (5, 3, 3))
    ).astype(np.uint8)
    la, va = policy.apply(params, obs)
    lb, vb = policy.apply(back, obs)
    assert np.array_equal(np.asarray(la), np.asarray(lb))
    assert np.array_equal(np.asarray(va), np.asarray(vb))


def test_duplicate_swap_twists_stay_bijective():
    """A symmetric coupling map expands SWAP on both edge directions; the
    canonical key collapses the pair, and the action twists must still be
    bijections (a last-write-wins lookup aliased duplicate actions and
    corrupted symmetrized logits)."""
    from qiskit_gym_tpu.spec.symmetry import compute_twists_square

    gs = [("SWAP", (0, 1)), ("SWAP", (1, 0)), ("SWAP", (1, 2)),
          ("SWAP", (2, 1))]
    _, act = compute_twists_square(3, gs)
    assert len(act) == 2  # identity + line reversal
    for p in act:
        assert sorted(p) == list(range(len(gs)))


def test_pauli_gym_forwards_difficulty_semantics():
    """pauli_diff_scale/max_rotations are readable on the gym (round-4 fix:
    train_pauli_bc.py keyed its grading difficulties on
    getattr(env, 'pauli_diff_scale', 4) and silently fell back to 4 for the
    scale-16 artifact because the knob only lived on the core)."""
    from qiskit_gym_tpu.envs.synthesis import PauliGym

    gym = PauliGym.from_coupling_map(LINE_3, max_rotations=3,
                                     pauli_diff_scale=16)
    assert gym.pauli_diff_scale == 16
    assert gym.max_rotations == 3


def test_pauli_get_state_validates_rotations():
    from qiskit_gym_tpu.envs.synthesis import PauliGym

    gym = PauliGym.from_coupling_map(LINE_3, max_rotations=2)
    cliff = Clifford.identity(3)
    with pytest.raises(ValueError, match="max_rotations"):
        gym.get_state((cliff, ["XZ", "ZX", "XX"]))
    with pytest.raises(ValueError, match="identity rotation"):
        gym.get_state((cliff, ["II"]))


def test_pauli_clifford_kwarg_rotations_roundtrip():
    """Targets given as a bare Clifford + rotations/rotation_params KWARGS
    must reconstruct with their rotations (the re-encode inside
    build_circuit_from_solution used to drop them)."""
    from qiskit_gym_tpu.envs.synthesis import PauliGym
    from qiskit_gym_tpu.quantum import (allclose_up_to_global_phase,
                                        circuit_unitary)

    gym = PauliGym.from_coupling_map(LINE_3, max_rotations=3)
    target = Circuit(3).cx(0, 1).rz(0.7, 1)
    cliff, labels, params = __import__(
        "qiskit_gym_tpu.envs.synthesis", fromlist=["_parse_pauli_circuit"]
    )._parse_pauli_circuit(target)
    enc = gym.get_state(cliff.adjoint().adjoint(), rotations=labels,
                        rotation_params=params)
    # solve on the spec twin (deterministic replay path)
    spec = gym.spec
    spec.set_state(enc)
    # brute-force a short solving action sequence
    import itertools

    sol = None
    for L in (1, 2, 3):
        for seq in itertools.product(range(spec.num_actions()), repeat=L):
            spec.set_state(enc)
            ok = True
            for a in seq:
                if spec.is_final():
                    ok = False
                    break
                spec.step(a)
            if ok and spec.success:
                sol = gym.solution_from_trace(enc, list(seq),
                                              [False] * len(seq))
                break
        if sol is not None:
            break
    assert sol is not None
    out = gym.build_circuit_from_solution(sol, cliff)
    assert any(g[0] in ("rx", "ry", "rz") for g in out)


def test_pauli_interleaved_targets_keep_their_rotations():
    """Encoding target A (with rotations), then target B, then rebuilding
    A's solution must restore A's rotation labels/angles — the remembered
    rotations are keyed per target, not instance-global."""
    from qiskit_gym_tpu.envs.synthesis import PauliGym, _parse_pauli_circuit

    gym = PauliGym.from_coupling_map(LINE_3, max_rotations=3)

    targ_a = Circuit(3).cx(0, 1).rz(0.7, 1)
    targ_b = Circuit(3).cx(1, 2).rz(1.3, 2)
    cliff_a, labels_a, params_a = _parse_pauli_circuit(targ_a)
    cliff_b, labels_b, params_b = _parse_pauli_circuit(targ_b)

    enc_a = gym.get_state(cliff_a, rotations=labels_a,
                          rotation_params=params_a)
    # encoding B afterwards used to clobber A's remembered rotations
    gym.get_state(cliff_b, rotations=labels_b, rotation_params=params_b)

    import itertools

    spec = gym.spec
    sol = None
    for L in (1, 2, 3):
        for seq in itertools.product(range(spec.num_actions()), repeat=L):
            spec.set_state(enc_a)
            ok = True
            for a in seq:
                if spec.is_final():
                    ok = False
                    break
                spec.step(a)
            if ok and spec.success:
                sol = gym.solution_from_trace(enc_a, list(seq),
                                              [False] * len(seq))
                break
        if sol is not None:
            break
    assert sol is not None
    out = gym.build_circuit_from_solution(sol, cliff_a)
    angles = [p[0] for n, q, p in out.data if n in ("rx", "ry", "rz")]
    assert angles and all(abs(abs(a) - 0.7) < 1e-9 for a in angles), angles

    # explicit override wins over the memo
    out2 = gym.build_circuit_from_solution(sol, cliff_a,
                                           rotations=labels_a,
                                           rotation_params=[0.2])
    angles2 = [p[0] for n, q, p in out2.data if n in ("rx", "ry", "rz")]
    assert angles2 and all(abs(abs(a) - 0.2) < 1e-9 for a in angles2)


def test_lf_get_state_accepts_nested_lists():
    env = LinearFunctionGym.from_coupling_map(
        [(0, 1), (1, 0), (1, 2), (2, 1)])
    mat = [[1, 0, 0], [1, 1, 0], [0, 0, 1]]
    got = env.get_state(mat)
    want = env.get_state(np.asarray(mat, dtype=np.uint8))
    assert got == want and len(got) == 9


def test_vector_env_inherits_difficulty():
    from qiskit_gym_tpu.envs import vector_gym_adapter

    env = PermutationGym.from_coupling_map(LINE_3, max_depth=16)
    env.difficulty = 5
    venv = vector_gym_adapter(env, num_envs=4)
    assert venv.difficulty == 5
