#!/usr/bin/env python
"""Matrix-env demonstration bootstrap, proven on a real weakness.

`clifford_heavy_hex_27q`'s frontier rows (QUALITY.md: d24 = 0.84 at
10 sampled searches) are the weakest of the shipped matrix-env artifacts.
This run measures whether `generate_demos_matrix` (reversed-scramble
plans, rl/demos.py) is a real training lever there — the round-3 VERDICT
asked for exactly this proof (demonstrate a QUALITY row move, or demote
the API to experimental):

1. load the shipped PPO artifact's policy,
2. behavior-clone it on matrix demos spanning difficulties 12-36 (past
   the d24/d32 frontier) with the AZ loss (fit_demos),
3. measure argmax + sampled best-of-10 evals at 16/24/32 before/after,
   keeping the best-by-eval@24 snapshot.

Evidence rows go to runs-evidence/clifford_27q_demo_bc_r4.jsonl
(committed). If the lift is real, the refit weights ship as
clifford_heavy_hex_27q.pt and bench_quality.py --only clifford_heavy_hex
--write refreshes the rows.

Usage: python examples/finetune_clifford_27q_demos.py [minutes=20]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qiskit_gym_tpu.envs import CliffordGym
from qiskit_gym_tpu.rl import (AlphaZeroConfig, BasicPolicyConfig,
                               RLSynthesis, fit_demos)
from qiskit_gym_tpu.rl.demos import generate_demos_matrix, prepare_demos
from qiskit_gym_tpu.utils.serialization import load_params, save_params

MODELS = os.path.join(os.path.dirname(__file__), "models")
EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        "clifford_27q_demo_bc_r4.jsonl")


def log_evidence(row):
    os.makedirs(os.path.dirname(EVIDENCE), exist_ok=True)
    row = {"t": round(time.time(), 1), **row}
    with open(EVIDENCE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 20.0)
    src_json = os.path.join(MODELS, "clifford_heavy_hex_27q.json")
    src_pt = os.path.join(MODELS, "clifford_heavy_hex_27q.pt")
    ppo = RLSynthesis.from_config_json(src_json, src_pt)
    env = ppo.env

    # BC runs through the AZ loss (one-hot demo visits + return-to-go
    # values) on the shipped policy's params; evals below use the same
    # sampled/argmax presets the QUALITY rows are measured with
    policy_cfg = BasicPolicyConfig.from_json(
        json.load(open(src_json))["policy"])
    from qiskit_gym_tpu.rl.configs import EvalConfig

    # only the two presets measure() reads — the default mcts_100 preset
    # (100 sims x 27q x 3 difficulties) would eat the chip budget without
    # being consumed by this experiment
    evals = {"ppo_deterministic": EvalConfig(),
             "ppo_10": EvalConfig(deterministic=False, num_searches=10)}
    rls = RLSynthesis(env, AlphaZeroConfig(num_episodes=8,
                                           num_mcts_searches=4, lr=1e-4,
                                           evals=evals,
                                           diff_metric="ppo_deterministic"),
                      policy_cfg, seed=3)
    algo = rls.algorithm
    algo.params = load_params(src_pt)

    spec = env.spec
    spec.rng = np.random.default_rng(20260819)
    t0 = time.time()
    demos = generate_demos_matrix(spec, list(range(12, 37, 2)), 400)
    log_evidence({"phase": "corpus", "episodes": demos["episodes"],
                  "steps": int(demos["action"].shape[0]),
                  "difficulties": "12..36 step 2",
                  "episodes_per_difficulty": 400, "seed": 20260819,
                  "gen_seconds": round(time.time() - t0, 1)})
    demos = prepare_demos(algo, demos)

    def measure(tag):
        row = {"phase": "eval", "tag": tag}
        for d in (16, 24, 32):
            ev = algo.run_evals(d)
            row[f"argmax@{d}"] = round(ev["ppo_deterministic"], 4)
            row[f"best10@{d}"] = round(ev["ppo_10"], 4)
        log_evidence(row)
        return row

    base = measure("shipped")
    best = dict(base)
    best_params = algo.params
    t0 = time.time()
    burst = 0
    while time.time() - t0 < budget_s:
        m = fit_demos(algo, demos, epochs=2, num_minibatches=64)
        burst += 1
        if burst % 3 == 0 or time.time() - t0 >= budget_s:
            row = measure(f"bc_burst_{burst}")
            row["loss"] = round(float(m["loss"]), 4)
            if row["best10@24"] > best["best10@24"] or (
                row["best10@24"] == best["best10@24"]
                and row["best10@32"] > best.get("best10@32", 0)
            ):
                best = row
                best_params = algo.params

    lift = best["best10@24"] - base["best10@24"]
    log_evidence({"phase": "final", "lift_best10@24": round(lift, 4),
                  "base": {k: v for k, v in base.items() if "@" in k},
                  "best": {k: v for k, v in best.items() if "@" in k}})
    if lift > 0.02:
        save_params(best_params, src_pt)
        print(f"SHIPPED refit weights (+{lift:.3f} best-of-10 @ d24) "
              f"-> {src_pt}", flush=True)
    else:
        print(f"no material lift ({lift:+.3f}); weights NOT shipped",
              flush=True)
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
