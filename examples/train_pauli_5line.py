#!/usr/bin/env python
"""Train the shipped pauli_5_line artifact (PPO, one TPU chip).

A 5-qubit line reaches the rotation regime fast (rotations appear at
difficulty >= pauli_diff_scale = 16), exercising the full Pauli-network
machinery: rotation tracking, trivial-sweep rewards, packed solutions.

Sparse-reward note (measured on the 27q cold start): with ent_coef=0.01
the entropy bonus overwhelms the policy gradient once collection success
drops near zero and the policy pins at uniform; 0.002 keeps the argmax
signal alive.

Usage: python examples/train_pauli_5line.py [minutes] (default 25)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import (BasicPolicyConfig, PPOConfig, RLSynthesis)

LINE_5 = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 25.0)
    env = PauliGym.from_coupling_map(LINE_5, max_rotations=4)
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
                  tb_path="runs/pauli_5_line")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        # save every loop: an interrupted run keeps its latest policy
        rls.save("examples/models/pauli_5_line.json",
                 "examples/models/pauli_5_line.pt", best=True)

    print(f"saved at difficulty {difficulty} "
          f"after {rls.algorithm.iteration} iterations")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
