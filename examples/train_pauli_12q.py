#!/usr/bin/env python
"""12q line Pauli-network PPO into the rotation regime (one TPU chip).

Mid-scale rotation-regime artifact: large enough to be beyond toy scale
(the 5q artifact), small enough that the joint skill — clean rotations AND
restore the tableau — is discoverable by exploration within hours (27q cold
starts stall; docs/TRAINING.md). Restricted (H, S, Sdg, CX) basis keeps the
action space at 58.

Usage: python examples/train_pauli_12q.py [minutes] (default 60)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import (BasicPolicyConfig, PPOConfig, RLSynthesis)

N = 12
LINE = [(i, i + 1) for i in range(N - 1)] + [(i + 1, i) for i in range(N - 1)]


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 60.0)
    env = PauliGym.from_coupling_map(LINE, basis_gates=("H", "S", "Sdg", "CX"),
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

    t0 = time.time()
    difficulty = 1
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=5,
                  tb_path="runs/pauli_12_line")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save("examples/models/pauli_12_line.json",
                 "examples/models/pauli_12_line.pt", best=True)

    print(f"saved at difficulty {difficulty} "
          f"after {rls.algorithm.iteration} iterations")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
