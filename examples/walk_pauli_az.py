#!/usr/bin/env python
"""Curriculum-walk continuation for an amplified Pauli AZ artifact.

The BC amplifier (`examples/train_pauli_bc.py`) jumps straight to the
2*scale gate and camps there; on the deep-scramble scale-16 artifact that
left mcts_100@32 at ~0.5 without ever clearing the 0.85 promotion gate
(runs-evidence/az_pauli_heavy_hex_27q_bc_r4.jsonl). This script takes the
other route the curriculum was built for (reference semantics:
/root/reference/src/qiskit_gym/rl/configs.py:149-152 — one-difficulty
promotions on a diff_threshold gate): start just past the last easily
proven difficulty and WALK, one gate-proven promotion at a time, with a
demo refit between learn() bursts as the entropy-collapse anchor.

Every `best_difficulty` this run reports is promotion-gated (mcts_100 >=
0.85 at that difficulty) — unlike the amplifier's camp phase, nothing is
claimed that the gate did not prove. The best-by-gate snapshot ships back
into the artifact with a `trained_with` provenance note.

Usage: python examples/walk_pauli_az.py <artifact-stem> [minutes] [start_diff]
e.g.   python examples/walk_pauli_az.py az_pauli_heavy_hex_27q 55 18
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qiskit_gym_tpu.envs import PauliGym
from qiskit_gym_tpu.rl import (POLICIES, AlphaZeroConfig, RLSynthesis,
                               fit_demos, generate_demos)
from qiskit_gym_tpu.rl.demos import prepare_demos

MODELS = os.path.join(os.path.dirname(__file__), "models")


def main():
    stem = sys.argv[1]
    budget_s = 60 * (float(sys.argv[2]) if len(sys.argv) > 2 else 55.0)
    # the round-4 run ended mid-walk with no 'final' phase row (the proof
    # evals on the shipped snapshot never ran); reserve the tail of the
    # budget so the final rows always land before the driver's clock runs out
    proof_reserve_s = min(0.25 * budget_s, 20 * 60.0)
    run = f"runs/{stem}_walk"
    evidence = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                            f"{stem}_walk_r5.jsonl")
    out_json = os.path.join(MODELS, f"{stem}.json")
    out_pt = os.path.join(MODELS, f"{stem}.pt")

    def log_evidence(row):
        os.makedirs(os.path.dirname(evidence), exist_ok=True)
        row = {"t": round(time.time(), 1), **row}
        with open(evidence, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    full = json.load(open(out_json))
    env = PauliGym.from_json(full["env"])
    pol_cls = full["policy_cls"].split(".")[-1]
    pol = POLICIES[pol_cls].from_json(full["policy"])
    pol = pol.with_updates(policy_cls=full["policy_cls"])
    scale = int(getattr(env, "pauli_diff_scale", 4))
    start = int(sys.argv[3]) if len(sys.argv) > 3 else scale + 2
    cfg = AlphaZeroConfig(num_episodes=512, num_mcts_searches=96,
                          num_epochs=4, lr=3e-4,
                          root_noise_eps=0.25, temperature_drop=12,
                          diff_replay=4, episode_packing=True,
                          pack_pool_slots=4)
    rls = RLSynthesis(env, cfg, pol, model_path=out_pt)
    rls.trained_with = full.get("trained_with")
    algo = rls.algorithm

    # best-snapshot defense: never ship worse-than-loaded weights; but only
    # gate-proven promotions below may raise best_difficulty
    algo.best_params = algo.params
    algo.best_difficulty = 0

    # ------------------------------------------------------- demo corpus
    spec = env.spec
    spec.rng = np.random.default_rng(20260820)
    stride = max(1, scale // 4)
    difficulties = list(range(2, 6 * scale + 1, stride))
    per_diff = max(600, min(1500, 33000 // len(difficulties)))
    t0 = time.time()
    demos = generate_demos(spec, difficulties, per_diff)
    log_evidence({"phase": "corpus", "episodes": demos["episodes"],
                  "steps": int(demos["action"].shape[0]),
                  "difficulties": f"2..{6 * scale} step {stride}",
                  "seed": 20260820,
                  "gen_seconds": round(time.time() - t0, 1)})
    demos = prepare_demos(algo, demos)

    base = algo.run_evals(start).get("mcts_100", 0.0)
    log_evidence({"phase": "walk", "burst": 0, "difficulty": start,
                  f"mcts_100@{start}": round(base, 4),
                  "note": "loaded-artifact baseline at the walk start"})

    # ------------------------------------------------------------- walk
    t0 = time.time()
    difficulty = start
    burst = 0
    prior_provenance = full.get("trained_with")
    while time.time() - t0 < budget_s - proof_reserve_s:
        rls.learn(initial_difficulty=difficulty, num_iterations=2,
                  tb_path=run)
        difficulty = int(getattr(env, "difficulty", difficulty))
        m = fit_demos(algo, demos, epochs=1, num_minibatches=32)
        burst += 1
        log_evidence({"phase": "walk", "burst": burst, "iter": algo.iteration,
                      "difficulty": difficulty,
                      "best_difficulty": algo.best_difficulty,
                      "bc_loss": round(float(m["loss"]), 4),
                      "minutes": round((time.time() - t0) / 60, 1)})
        if algo.best_difficulty > 0:
            # append to the prior provenance chain rather than replacing it
            # (the round-4 version of this script clobbered it)
            rls.trained_with = (
                f"{stem}: curriculum walk (examples/walk_pauli_az.py) from "
                f"difficulty {start}; every promotion gate-proven (mcts_100 "
                f">= 0.85); best proven difficulty {algo.best_difficulty}; "
                f"ships the best-by-gate snapshot (evidence: "
                f"runs-evidence/{stem}_walk_r5.jsonl). Prior provenance: "
                + (prior_provenance or "none recorded"))
            rls.save(out_json, out_pt, best=True)

    # final proof rows on the snapshot the artifact ships
    live = algo.params
    if algo.best_params is not None:
        algo.params = algo.best_params
    proof = {}
    for d in sorted({scale, 2 * scale, 3 * scale,
                     max(algo.best_difficulty, start)}):
        proof[f"mcts_100@{d}"] = algo.run_evals(d).get("mcts_100")
    algo.params = live
    log_evidence({"phase": "final", "best_difficulty": algo.best_difficulty,
                  "stopped_at_difficulty": difficulty, **proof})
    print(f"walk stopped at difficulty {difficulty} "
          f"(gate-proven best {algo.best_difficulty})")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
