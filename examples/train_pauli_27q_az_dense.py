#!/usr/bin/env python
"""27q heavy-hex Pauli: MCTS-assisted crossing of the rotation onset.

The 18q recipe (examples/train_pauli_18q_az.py) at 27 qubits: PPO seeds
rotation-onset successes at only ~0.2% and stalls; 96-sim AlphaZero
self-play warm-started from the pre-onset PPO snapshot seeds at 7% and,
with lr 3e-4 + 4 fitting epochs, amplifies 7% -> 85%+ and cascades the
curriculum from difficulty 4 to 8 (rotation budget 2) within ~70 min.

Prereq: examples/models/pauli_heavy_hex_27q_dense.* from
  python examples/train_pauli_27q_dense.py 12   (stops pre-onset)

Usage: python examples/train_pauli_27q_az_dense.py [minutes] (default 75)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import AlphaZeroConfig, BasicPolicyConfig, RLSynthesis

MODELS = os.path.join(os.path.dirname(__file__), "models")


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 75.0)
    cfgj = json.load(open(os.path.join(MODELS,
                                       "pauli_heavy_hex_27q_dense.json")))
    env = PauliGym.from_json(cfgj["env"])
    cfg = AlphaZeroConfig(num_episodes=512, num_mcts_searches=96,
                          num_epochs=4, lr=3e-4,
                          root_noise_eps=0.25, temperature_drop=8)
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(),
                      model_path=os.path.join(
                          MODELS, "pauli_heavy_hex_27q_dense.pt"))

    t0 = time.time()
    difficulty = 3          # just below the rotation onset (scale 4)
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=2,
                  tb_path="runs/az_pauli_27q_dense")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save(os.path.join(MODELS, "az_pauli_heavy_hex_27q_dense.json"),
                 os.path.join(MODELS, "az_pauli_heavy_hex_27q_dense.pt"),
                 best=True)

    print(f"stopped at difficulty {difficulty}")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
