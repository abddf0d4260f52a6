#!/usr/bin/env python
"""Train an Nq line Pauli-network policy into the rotation regime.

Generalizes examples/train_pauli_12q.py (the proven dense-rotation recipe,
docs/TRAINING.md): restricted H/S/Sdg/CX basis, rotations from difficulty 4,
depth budget 4d, 0.05 sweep bonus. Ships examples/models/pauli_<N>_line.*.

Cold-start scale frontier (measured): 12q reaches difficulty 37 in an hour;
27q seeds successes at only ~0.2% of episodes at the rotation onset and
PPO cannot amplify them.

Usage: python examples/train_pauli_line.py [qubits] [minutes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import (BasicPolicyConfig, PPOConfig, RLSynthesis)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    budget_s = 60 * (float(sys.argv[2]) if len(sys.argv) > 2 else 60.0)
    line = [(i, i + 1) for i in range(n - 1)] + \
           [(i + 1, i) for i in range(n - 1)]
    env = PauliGym.from_coupling_map(line, basis_gates=("H", "S", "Sdg", "CX"),
                                     max_rotations=5,
                                     pauli_diff_scale=4, depth_slope=4,
                                     pauli_layer_reward=0.05)
    cfg = PPOConfig(
        num_episodes=2048, num_epochs=4, num_minibatches=16,
        episode_packing=True, pack_pool_slots=8,
        lr=3e-4, ent_coef=0.002,
    )
    rls = RLSynthesis(env, cfg, BasicPolicyConfig())
    rls.algorithm.fixed_horizon = True

    name = f"pauli_{n}_line"
    t0 = time.time()
    difficulty = 1
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=5,
                  tb_path=f"runs/{name}")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save(f"examples/models/{name}.json",
                 f"examples/models/{name}.pt", best=True)

    print(f"saved at difficulty {difficulty} "
          f"after {rls.algorithm.iteration} iterations")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
