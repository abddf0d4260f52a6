"""Tour of qiskit-gym-tpu (script form of the reference's intro notebook).

Run:  PYTHONPATH=.. python intro.py        (CPU ok; TPU much faster)

Covers: building gyms from coupling maps, manual Gymnasium stepping,
PPO training with the difficulty curriculum, synthesis + round-trip
verification, config/checkpoint persistence, AlphaZero/MCTS solve, and
Pauli-network (Clifford + rotation) synthesis with a shipped artifact.
"""

import numpy as np

from qiskit_gym_tpu.envs import (
    CliffordGym,
    LinearFunctionGym,
    PermutationGym,
    gym_adapter,
)
from qiskit_gym_tpu.quantum import (
    Circuit,
    Clifford,
    allclose_up_to_global_phase,
    circuit_unitary,
    linear_from_circuit,
    permutation_pattern,
)
from qiskit_gym_tpu.rl import (
    BasicPolicyConfig,
    EvalConfig,
    PPOConfig,
    RLSynthesis,
)

GRID_3X3 = [(0, 1), (1, 2), (3, 4), (4, 5), (6, 7), (7, 8),
            (0, 3), (3, 6), (1, 4), (4, 7), (2, 5), (5, 8)]
LINE_3 = [(0, 1), (1, 2)]


def manual_stepping():
    print("=== 1. Manual stepping through the Gymnasium adapter ===")
    env = LinearFunctionGym.from_coupling_map(LINE_3, difficulty=2)
    genv = gym_adapter(env)
    obs, _ = genv.reset(seed=7)
    print("observation (GF(2) matrix):\n", obs)
    total = 0.0
    while not genv._spec_env.is_final():
        obs, reward, done, _, _ = genv.step(genv.action_space.sample())
        total += reward
    print("episode return:", round(total, 4), "| solved:", genv._spec_env.success)


def train_and_synth():
    print("\n=== 2. PPO on 3x3-grid permutation routing ===")
    env = PermutationGym.from_coupling_map(GRID_3X3, max_depth=64)
    cfg = PPOConfig(
        num_episodes=256, num_epochs=4,
        evals={"ppo_deterministic": EvalConfig(num_episodes=64),
               "ppo_10": EvalConfig(num_episodes=32, deterministic=False,
                                    num_searches=10)},
    )
    rls = RLSynthesis(env, cfg, BasicPolicyConfig())
    rls.learn(initial_difficulty=1, num_iterations=10)
    print("difficulty reached:", env.difficulty)

    pattern = [1, 0, 2, 3, 4, 5, 6, 8, 7]
    out = rls.synth(pattern, num_searches=200)
    assert out is not None, "synthesis failed"
    got = permutation_pattern(linear_from_circuit(out)).tolist()
    print("target:", pattern, "| synthesized implements:", got,
          "| swaps used:", len(out))
    assert got == pattern

    rls.save("perm_grid_3x3.json", "perm_grid_3x3.pt")
    rls2 = RLSynthesis.from_config_json("perm_grid_3x3.json", "perm_grid_3x3.pt")
    assert rls2.synth(pattern, num_searches=200) is not None
    print("save/load round-trip ok")
    return rls


def clifford_phase_exact():
    print("\n=== 3. Clifford synthesis is exact incl. phases ===")
    env = CliffordGym.from_coupling_map(LINE_3, basis_gates=("H", "S", "CX"),
                                        max_depth=24)
    cfg = PPOConfig(num_episodes=64, num_epochs=2,
                    evals={"ppo_deterministic": EvalConfig(num_episodes=32)})
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(embedding_size=128,
                                                  common_layers=[64]))
    target = Circuit(3).h(0).cx(0, 1).s(1).cx(1, 2)
    out = rls.synth(target, num_searches=1024)
    if out is None:
        print("(stochastic search missed — rerun or train first)")
        return
    exact = allclose_up_to_global_phase(circuit_unitary(out),
                                        circuit_unitary(target))
    print("unitary-exact (up to global phase):", exact)


def pauli_network_synthesis():
    print("\n=== 4. Pauli-network synthesis (shipped artifact) ===")
    import os

    cfg = os.path.join(os.path.dirname(__file__), "models",
                       "pauli_5_line.json")
    if not os.path.exists(cfg):
        print("(pauli_5_line artifact not present — skipping)")
        return
    rls = RLSynthesis.from_config_json(cfg, cfg[:-5] + ".pt")
    target = Circuit(5).h(0).cx(0, 1).rz(0.7, 1).cx(1, 2).rx(0.3, 2)
    out = rls.synth(target, deterministic=True, num_searches=1)
    if out is None:
        out = rls.synth(target, num_searches=32)
    exact = out is not None and allclose_up_to_global_phase(
        circuit_unitary(out), circuit_unitary(target))
    print("rotation circuit unitary-exact (up to global phase):", exact)


if __name__ == "__main__":
    manual_stepping()
    train_and_synth()
    clifford_phase_exact()
    pauli_network_synthesis()
