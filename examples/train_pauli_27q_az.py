#!/usr/bin/env python
"""AZ/MCTS fine-tune of the 27q heavy-hex Pauli policy (one TPU chip).

PPO alone plateaus at the rotation-onset wall (difficulty 16: the first
rotation appears alongside 16 tableau scrambles; collection success pins at
zero, docs/TRAINING.md). The proven recipe from the Clifford artifact —
warm-start AZ self-play from the PPO policy with Dirichlet root noise and a
temperature drop — lets MCTS *search* find solutions the policy can't
sample, then bootstraps policy/value from them.

Usage: python examples/train_pauli_27q_az.py [minutes] (default 45)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import AlphaZeroConfig, BasicPolicyConfig, RLSynthesis

MODELS = os.path.join(os.path.dirname(__file__), "models")


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 45.0)
    import json

    ppo_cfg = json.load(open(os.path.join(MODELS,
                                          "pauli_heavy_hex_27q.json")))
    env = PauliGym.from_json(ppo_cfg["env"])
    cfg = AlphaZeroConfig(
        num_episodes=256, num_mcts_searches=48, num_epochs=2, lr=1e-4,
        root_noise_eps=0.25, temperature_drop=16,
    )
    rls = RLSynthesis(env, cfg, BasicPolicyConfig(),
                      model_path=os.path.join(MODELS,
                                              "pauli_heavy_hex_27q.pt"))

    t0 = time.time()
    # restart just below the wall so self-play re-derives success and the
    # curriculum carries it through the rotation regime
    difficulty = 14
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=2,
                  tb_path="runs/az_pauli_heavy_hex_27q")
        difficulty = int(getattr(rls.env, "difficulty", difficulty))
        print(f"[{(time.time() - t0) / 60:5.1f} min] iter "
              f"{rls.algorithm.iteration} difficulty {difficulty}",
              flush=True)
        rls.save(os.path.join(MODELS, "az_pauli_heavy_hex_27q.json"),
                 os.path.join(MODELS, "az_pauli_heavy_hex_27q.pt"),
                 best=True)

    print(f"stopped at difficulty {difficulty} "
          f"after {rls.algorithm.iteration} iterations")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
