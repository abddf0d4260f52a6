#!/usr/bin/env python
"""27q heavy-hex Pauli PPO with a DENSE rotation curriculum (one TPU chip).

At the parity default `pauli_diff_scale=16`, the first rotation appears at
difficulty 16 — alongside 16 tableau scrambles — and both PPO and 48-sim AZ
hit a zero-success wall (docs/TRAINING.md "entropy-collapse wall"): the
post-scramble rotation column is an arbitrary-weight Pauli and the solve
reward is all-or-nothing. `pauli_diff_scale=4` is the same env family
(reference-exposed knob) with rotations from difficulty 4: the policy
practices rotation cleanup on 4-scramble tableaus first, and rotation count
grows every 4 levels instead of every 16.

Usage: python examples/train_pauli_27q_dense.py [minutes] (default 60)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import (BasicPolicyConfig, PPOConfig, RLSynthesis)

HEAVY_HEX_27 = [
    (0, 1), (1, 2), (1, 4), (2, 3), (3, 5), (4, 7), (5, 8), (6, 7), (7, 10),
    (8, 9), (8, 11), (10, 12), (11, 14), (12, 13), (12, 15), (13, 14),
    (14, 16), (15, 18), (16, 19), (17, 18), (18, 21), (19, 20), (19, 22),
    (21, 23), (22, 25), (23, 24), (24, 25), (25, 26),
]


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 60.0)
    edges = HEAVY_HEX_27 + [(b, a) for a, b in HEAVY_HEX_27]
    # pauli_layer_reward: the per-swept-rotation bonus is the ONLY
    # intermediate signal in rotation episodes (solve reward is
    # all-or-nothing); the 0.01 default gave no measurable bridge at 27q
    # (succ pinned at 0 through difficulty 4), 0.25 makes cleaning
    # rotations itself worth pursuing during exploration.
    # The recipe that carried the 12q artifact through the rotation regime
    # (difficulty 12+ in 9 minutes; docs/TRAINING.md):
    # - depth_slope=4: budget 4d — d scrambles + ~3 cleanup ops need ~d+3
    #   OPTIMAL actions; the default 2d budget starves exploration.
    # - pauli_layer_reward=0.05: intermediate signal for cleaning without
    #   sweep-bonus farming out-gradienting the solve reward (0.25 did:
    #   success entered at 1.2%, then decayed to zero).
    # - restricted (H, S, Sdg, CX) basis: 185 actions instead of 303.
    # - pauli_diff_scale=4: rotation onset at difficulty 4 (4 scrambles),
    #   growing every 4 levels.
    env = PauliGym.from_coupling_map(edges,
                                     basis_gates=("H", "S", "Sdg", "CX"),
                                     max_rotations=5,
                                     pauli_diff_scale=4, depth_slope=4,
                                     pauli_layer_reward=0.05)
    # ent_coef 0.0005: at 27q the rotation-onset success seed is tiny
    # (~0.3% of episodes) and 0.002 entropy pressure extinguishes it before
    # PPO can amplify (12q seeds at >5% and survives 0.002).
    cfg = PPOConfig(
        num_episodes=2048, num_epochs=4, num_minibatches=16,
        episode_packing=True, pack_pool_slots=8,
        lr=3e-4, ent_coef=0.0005,
    )
    rls = RLSynthesis(env, cfg, BasicPolicyConfig())
    rls.algorithm.fixed_horizon = True

    t0 = time.time()
    difficulty = 1
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=5,
                  tb_path="runs/pauli_heavy_hex_27q_dense")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save("examples/models/pauli_heavy_hex_27q_dense.json",
                 "examples/models/pauli_heavy_hex_27q_dense.pt", best=True)

    print(f"saved at difficulty {difficulty} "
          f"after {rls.algorithm.iteration} iterations")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
