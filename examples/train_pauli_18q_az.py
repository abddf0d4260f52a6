#!/usr/bin/env python
"""18q line Pauli: MCTS-assisted crossing of the rotation onset.

At 18 qubits PPO seeds rotation-onset successes at only ~0.1% of episodes
and cannot amplify them (docs/TRAINING.md "scale frontier"). AlphaZero
self-play warm-started from the PPO policy's pre-onset snapshot multiplies
the seed rate ~70x (the tree searches 96 alternatives per move, guided by
the sweep bonus), and with enough fitting pressure (lr 3e-4, 4 epochs) the
policy internalizes it: measured 8% -> 85%+ collection success and a
difficulty 4 -> 7 curriculum crossing within 45 minutes.

Prereq: examples/models/pauli_18_line.* from
  python examples/train_pauli_line.py 18 20   (stops pre-onset, best=diff 3)

Usage: python examples/train_pauli_18q_az.py [minutes] (default 45)
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
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 45.0)
    cfgj = json.load(open(os.path.join(MODELS, "pauli_18_line.json")))
    env = PauliGym.from_json(cfgj["env"])
    cfg = AlphaZeroConfig(num_episodes=512, num_mcts_searches=96,
                          num_epochs=4, lr=3e-4,
                          root_noise_eps=0.25, temperature_drop=8)
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(),
                      model_path=os.path.join(MODELS, "pauli_18_line.pt"))

    t0 = time.time()
    difficulty = 3          # just below the rotation onset (scale 4)
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=2,
                  tb_path="runs/az_pauli_18_line")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save(os.path.join(MODELS, "az_pauli_18_line.json"),
                 os.path.join(MODELS, "az_pauli_18_line.pt"), best=True)

    print(f"stopped at difficulty {difficulty}")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
