#!/usr/bin/env python
"""Brevity finetune for a small PPO artifact (head-to-head 2q gap vs ref).

bench_vs_reference measured our small-config artifacts a few tenths of a
2q gate behind the reference's shipped weights on some depths (solve rate
tied at 1.00). This continues PPO training from the shipped weights,
cycling mid difficulties, and after each burst scores the live params on
the HEAD-TO-HEAD metric itself (seeded random-circuit targets, 100-lane
portfolio solve, verified mean 2q at full solve rate). Only a
strictly-better-scoring snapshot is kept, and the artifact is only
overwritten at the end if the final best beats the shipped score — a
plateaued run can never regress the artifact. Proven on lf_5_line
(6.58 -> 6.40, shipped, runs-evidence/lf_5_line_brevity_r5.jsonl).

Usage: python scripts/finetune_brevity.py [stem] [minutes]
stem in {lf_5_line, clifford_3q_custom, perm_grid_3x3}
"""

import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench_vs_reference as bvr
from qiskit_gym_tpu.rl import RLSynthesis

CHECKERS = {
    # score the full head-to-head depth set so the gate tracks exactly what
    # the published table measures (the first lf/clifford runs scored [8,16]
    # only and left d4/d16 tenths on the table)
    "lf_5_line": ("_lf_ck", [4, 8, 16]),
    "clifford_3q_custom": ("_cliff_ck", [4, 8, 16]),
    "perm_grid_3x3": ("_perm_ck", [4, 8, 16]),
}
STEM = sys.argv[1] if len(sys.argv) > 1 else "lf_5_line"
CHECK = getattr(bvr, CHECKERS[STEM][0])
MODELS = os.path.join(os.path.dirname(__file__), "..", "examples", "models")
EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        f"{STEM}_brevity_r5.jsonl")
DEPTHS = CHECKERS[STEM][1]


def log_row(row):
    row = {"t": round(time.time(), 1), **row}
    with open(EVIDENCE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def score(rls, num_targets=48):
    """(solve_rate_min, total mean 2q) on the head-to-head protocol's own
    target distribution (seeds disjoint from the published table's)."""
    ref_gs = rls.env.gateset
    nq = rls.env.config["num_qubits"]
    solves, twoqs = [], []
    for depth in DEPTHS:
        rng = np.random.default_rng(777 + depth)
        ok, cx = 0, []
        for _ in range(num_targets):
            target = bvr._random_target(ref_gs, nq, depth, rng)
            out = rls.synth(target, num_searches=100)
            if out is None or not CHECK(out, target):
                continue
            ok += 1
            cx.append(bvr._count_2q(out))
        solves.append(ok / num_targets)
        twoqs.append(float(np.mean(cx)) if cx else float("inf"))
    return min(solves), float(np.mean(twoqs))


def main():
    budget_s = 60 * (float(sys.argv[2]) if len(sys.argv) > 2 else 40.0)
    out_json = os.path.join(MODELS, f"{STEM}.json")
    out_pt = os.path.join(MODELS, f"{STEM}.pt")
    rls = RLSynthesis.from_config_json(out_json, out_pt)
    algo = rls.algorithm

    base_solve, base_2q = score(rls)
    best = (base_solve, base_2q)
    best_params = algo.params
    log_row({"phase": "baseline", "solve": base_solve,
             "mean_2q": round(base_2q, 3)})

    t0 = time.time()
    burst = 0
    diffs = [8, 16, 24]
    while time.time() - t0 < budget_s:
        d = diffs[burst % len(diffs)]
        rls.learn(initial_difficulty=d, num_iterations=3,
                  tb_path=f"runs/{STEM}_brevity")
        s, q = score(rls)
        burst += 1
        keep = s >= best[0] and q < best[1]
        if keep:
            best = (s, q)
            best_params = algo.params
        log_row({"phase": "burst", "burst": burst, "difficulty": d,
                 "solve": s, "mean_2q": round(q, 3), "kept": keep,
                 "minutes": round((time.time() - t0) / 60, 1)})

    if best[1] < base_2q and best[0] >= base_solve:
        algo.best_params = best_params
        prior = rls.trained_with
        rls.trained_with = (
            f"{STEM}: round-5 brevity finetune "
            f"(scripts/finetune_brevity.py) — mean 2q on the seeded "
            f"head-to-head protocol {base_2q:.2f} -> {best[1]:.2f} at solve "
            f"{best[0]:.2f} (evidence: runs-evidence/{STEM}_brevity_r5"
            f".jsonl). Prior provenance: " + (prior or "none recorded"))
        rls.save(out_json, out_pt, best=True)
        log_row({"phase": "final", "shipped": True,
                 "mean_2q": round(best[1], 3), "solve": best[0]})
    else:
        log_row({"phase": "final", "shipped": False,
                 "note": "no snapshot beat the shipped weights"})
    os._exit(0)


if __name__ == "__main__":
    main()
