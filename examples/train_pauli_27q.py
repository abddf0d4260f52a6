#!/usr/bin/env python
"""Train the shipped pauli_heavy_hex_27q artifact (PPO, one TPU chip).

Recipe = the 27q Clifford one from docs/TRAINING.md (large action space:
minibatched epochs + episode packing + fixed horizon). The curriculum
difficulty feeds both the tableau scramble count and the rotation budget
(difficulty // pauli_diff_scale rotations, reference pauli.rs:580).

Usage: python examples/train_pauli_27q.py [minutes] (default 30)
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
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 30.0)
    # SYMMETRIC map: the Pauli env's reset scramble applies Clifford-
    # convention CX row ops while step gates use the network (transposed)
    # convention, so inverting a scrambled CX(a,b) takes the CX(b,a) ACTION
    # — absent from a one-direction edge list, success caps near the H/S
    # fraction of scrambles (~30%, measured). Reference runs use qiskit
    # CouplingMaps, which carry both directions.
    edges = HEAVY_HEX_27 + [(b, a) for a, b in HEAVY_HEX_27]
    env = PauliGym.from_coupling_map(edges, max_rotations=5)
    # ent_coef: 0.01 pins the policy at uniform on this cold start (entropy
    # bonus overwhelms the near-zero-success policy gradient; measured —
    # entropy sat at ln(num_actions) for 260 iterations); 0.002 learns.
    cfg = PPOConfig(
        num_episodes=2048, num_epochs=4, num_minibatches=16,
        episode_packing=True, pack_pool_slots=8,
        lr=3e-4, ent_coef=0.002,
    )
    rls = RLSynthesis(env, cfg, BasicPolicyConfig())
    rls.algorithm.fixed_horizon = True

    t0 = time.time()
    difficulty = 1
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=5,
                  tb_path="runs/pauli_heavy_hex_27q")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        # save every loop: an interrupted run keeps its latest policy
        rls.save("examples/models/pauli_heavy_hex_27q.json",
                 "examples/models/pauli_heavy_hex_27q.pt", best=True)

    print(f"saved at difficulty {difficulty} "
          f"after {rls.algorithm.iteration} iterations")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
