#!/usr/bin/env python
"""27q heavy-hex FULL-gateset Pauli: demonstration-bootstrapped curriculum.

The difficulty-8 plateau is priors-bound (docs/TRAINING.md "Sims-vs-priors":
MCTS-96 argmax 0.09 vs MCTS-512 0.19 — a 5x bigger tree only doubles the
solve rate). Self-play cannot amplify plans the policy never proposes, so
this run supplies them directly:

- phase 1 (BC): behavior-clone on constructively solved episodes from the
  env's own reset distribution (rl/demos.py), spanning difficulties 2-24 —
  well past the frontier. Round 3 measured 12 epochs on a small corpus
  lifting argmax @ difficulty 8 from 0.03 to 0.17 with the loss still
  falling; round 4 scales the corpus ~20x (packed on device) and trains to
  an eval plateau, keeping the best-by-eval snapshot.
- phase 2 (AZ + expert replay): resume AlphaZero self-play with a
  demo-refit between learn() bursts, so the tree amplifies the cloned
  priors while the demos anchor against the entropy-collapse wall
  (docs/TRAINING.md).

Target (round-3 VERDICT item 1): proven best_difficulty >= 12 at
pauli_diff_scale=4 (3-rotation episodes) with >= 0.85 on the mcts_100 eval.

Every phase appends an evidence row to runs-evidence/
az_pauli_27q_full_bc_r4.jsonl (committed), so the run's claims are
reproducible from the repo.

Usage: python examples/train_pauli_27q_full_bc.py [minutes] [bc_minutes]
       (defaults 300 / 45; resumes runs/az_pauli_27q_full_bc/
       train_state.msgpack exactly when present, else warm-starts from the
       shipped az_pauli_heavy_hex_27q_full snapshot)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import (AlphaZeroConfig, BasicPolicyConfig,
                               RLSynthesis, fit_demos, generate_demos)
from qiskit_gym_tpu.rl.demos import prepare_demos
from qiskit_gym_tpu.utils.serialization import load_params

MODELS = os.path.join(os.path.dirname(__file__), "models")
RUN = "runs/az_pauli_27q_full_bc"
EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        "az_pauli_27q_full_bc_r4.jsonl")
HEAVY_HEX_27 = [
    (0, 1), (1, 2), (1, 4), (2, 3), (3, 5), (4, 7), (5, 8), (6, 7), (7, 10),
    (8, 9), (8, 11), (10, 12), (11, 14), (12, 13), (12, 15), (13, 14),
    (14, 16), (15, 18), (16, 19), (17, 18), (18, 21), (19, 20), (19, 22),
    (21, 23), (22, 25), (23, 24), (24, 25), (25, 26),
]


def log_evidence(row):
    os.makedirs(os.path.dirname(EVIDENCE), exist_ok=True)
    row = {"t": round(time.time(), 1), **row}
    with open(EVIDENCE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 300.0)
    bc_budget_s = 60 * (float(sys.argv[2]) if len(sys.argv) > 2 else 45.0)
    edges = HEAVY_HEX_27 + [(b, a) for a, b in HEAVY_HEX_27]
    env = PauliGym.from_coupling_map(edges, max_rotations=5,
                                     pauli_diff_scale=4, depth_slope=4,
                                     pauli_layer_reward=0.05)
    out_json = os.path.join(MODELS, "az_pauli_heavy_hex_27q_full.json")
    out_pt = os.path.join(MODELS, "az_pauli_heavy_hex_27q_full.pt")
    cfg = AlphaZeroConfig(num_episodes=512, num_mcts_searches=96,
                          num_epochs=4, lr=3e-4,
                          root_noise_eps=0.25, temperature_drop=12,
                          diff_replay=4, episode_packing=True,
                          pack_pool_slots=4)
    rls = RLSynthesis(env, cfg, BasicPolicyConfig())
    algo = rls.algorithm

    snap = os.path.join(RUN, "train_state.msgpack")
    resumed = False
    if os.path.exists(snap):
        algo.restore_training_state(snap)
        resumed = True
        print(f"resumed iter {algo.iteration} difficulty {env.difficulty}",
              flush=True)
    elif os.path.exists(out_pt):
        algo.params = load_params(out_pt)
        # the warm start itself seeds the best-snapshot defense so a
        # plateaued run can never overwrite the artifact with worse params
        algo.best_params = algo.params
        algo.best_difficulty = 8
        env.difficulty = 8
        print("warm-started from shipped best snapshot @ difficulty 8",
              flush=True)

    # ------------------------------------------------------- demo corpus
    spec = env.spec
    spec.rng = np.random.default_rng(20260819)
    t0 = time.time()
    demos = generate_demos(spec, list(range(2, 25)), 1500)
    log_evidence({"phase": "corpus", "episodes": demos["episodes"],
                  "steps": int(demos["action"].shape[0]),
                  "attempts": demos["attempts"],
                  "difficulties": "2..24", "episodes_per_difficulty": 1500,
                  "seed": 20260819, "gen_seconds": round(time.time() - t0, 1)})
    demos = prepare_demos(algo, demos)  # one device upload, reused all run

    # ------------------------------------------------------- phase 1: BC
    t0 = time.time()
    if not resumed:
        # argmax policy eval (cheap) tracks progress; the expensive
        # mcts_100 gate is sampled at checkpoints. Keep the best-by-gate
        # snapshot so BC can never end on an overfit/collapsed step.
        best_gate = algo.run_evals(8).get("mcts_100", 0.0)
        log_evidence({"phase": "bc", "burst": 0,
                      "mcts_100@8": round(best_gate, 4),
                      "note": "warm-start baseline"})
        burst = 0
        while time.time() - t0 < bc_budget_s:
            m = fit_demos(algo, demos, epochs=4, num_minibatches=96)
            burst += 1
            if burst % 4 == 0 or time.time() - t0 >= bc_budget_s:
                evals8 = algo.run_evals(8)
                evals12 = algo.run_evals(12)
                row = {"phase": "bc", "burst": burst,
                       "loss": round(float(m["loss"]), 4),
                       "argmax@8": evals8.get("ppo_deterministic"),
                       "mcts_100@8": evals8.get("mcts_100"),
                       "argmax@12": evals12.get("ppo_deterministic"),
                       "mcts_100@12": evals12.get("mcts_100"),
                       "minutes": round((time.time() - t0) / 60, 1)}
                log_evidence(row)
                if evals8.get("mcts_100", 0.0) >= best_gate:
                    best_gate = evals8["mcts_100"]
                    algo.best_params = algo.params
                    algo.best_difficulty = max(algo.best_difficulty, 8)
        rls.save(out_json, out_pt, best=True)
        log_evidence({"phase": "bc_done", "bursts": burst,
                      "best_mcts_100@8": round(best_gate, 4),
                      "minutes": round((time.time() - t0) / 60, 1)})

    # --------------------------------------- phase 2: AZ + expert replay
    t0 = time.time()
    difficulty = max(int(getattr(env, "difficulty", 1)), 8)
    while time.time() - t0 < budget_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=2,
                  tb_path=RUN)
        difficulty = int(getattr(env, "difficulty", difficulty))
        # expert replay between bursts: anchors the policy on solved plans
        # at every difficulty while self-play probes the frontier
        m = fit_demos(algo, demos, epochs=1, num_minibatches=32)
        log_evidence({"phase": "az", "iter": algo.iteration,
                      "difficulty": difficulty,
                      "best_difficulty": algo.best_difficulty,
                      "bc_loss": round(float(m["loss"]), 4),
                      "minutes": round((time.time() - t0) / 60, 1)})
        rls.save(out_json, out_pt, best=True)

    # final proof rows: the gate eval at the proven difficulty and beyond,
    # measured on the BEST snapshot (what the artifact ships)
    live_params = algo.params
    if algo.best_params is not None:
        algo.params = algo.best_params
    proof = {}
    for d in (8, 12, max(algo.best_difficulty, 12)):
        proof[f"mcts_100@{d}"] = algo.run_evals(d).get("mcts_100")
    algo.params = live_params
    log_evidence({"phase": "final", "best_difficulty": algo.best_difficulty,
                  "stopped_at_difficulty": difficulty, **proof})
    print(f"stopped at difficulty {difficulty} "
          f"(best proven {algo.best_difficulty})")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
