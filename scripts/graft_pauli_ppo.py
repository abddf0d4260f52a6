#!/usr/bin/env python
"""Evaluate (and optionally ship) the AZ-flagship weight graft into the
pauli_heavy_hex_27q PPO artifact (VERDICT r4 Next #4).

`pauli_heavy_hex_27q` (PPO) and `az_pauli_heavy_hex_27q` (AZ) share an
IDENTICAL env config and policy architecture (BasicPolicy 512/[256]); the
PPO artifact's verified synth d8 has sat at 0.67-0.71 since r4 while the
AZ flagship's weights kept improving through BC + curriculum walks. This
script measures the PPO artifact's own quality protocol (PPO-path synth
round-trips + sampled best-of-10 evals — no MCTS anywhere) under (a) the
shipped PPO weights and (b) the AZ flagship's weights, prints both, and
with --ship overwrites the PPO artifact with the graft if it wins on
every row.

Usage: python scripts/graft_pauli_ppo.py [--ship]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MODELS = os.path.join(os.path.dirname(__file__), "..", "examples", "models")
EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        "pauli_ppo_graft_r5.jsonl")


def log_row(row):
    row = {"t": round(time.time(), 1), **row}
    with open(EVIDENCE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def measure(tag):
    import bench_quality as bq
    from qiskit_gym_tpu.quantum import Clifford

    def cliff_ck(out, t):
        return np.array_equal(Clifford(out).tableau, Clifford(t).tableau)

    ev = bq.eval_artifact("pauli_heavy_hex_27q", difficulties=[4, 8, 14],
                          num_episodes=128)
    sy = bq.synth_quality("pauli_heavy_hex_27q", depths=[4, 8],
                          check=cliff_ck)
    log_row({"tag": tag, "evals": ev, "synth": sy})
    return ev, sy


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    ppo_pt = os.path.join(MODELS, "pauli_heavy_hex_27q.pt")
    az_pt = os.path.join(MODELS, "az_pauli_heavy_hex_27q.pt")
    base_ev, base_sy = measure("ppo_shipped")

    # graft: same policy shape, so the AZ .pt loads as the PPO artifact's
    # weights directly; swap the file in a temp copy
    import shutil

    backup = ppo_pt + ".pre_graft"
    shutil.copyfile(ppo_pt, backup)
    shutil.copyfile(az_pt, ppo_pt)
    try:
        graft_ev, graft_sy = measure("az_grafted")
    finally:
        if "--ship" not in sys.argv:
            shutil.move(backup, ppo_pt)

    if "--ship" in sys.argv:
        better = all(
            g["solve_rate"] >= b["solve_rate"] - 0.02
            for g, b in zip(graft_ev + graft_sy, base_ev + base_sy)
        ) and sum(g["solve_rate"] for g in graft_sy) > sum(
            b["solve_rate"] for b in base_sy)
        if better:
            os.remove(backup)
            cfg_path = os.path.join(MODELS, "pauli_heavy_hex_27q.json")
            cfg = json.load(open(cfg_path))
            az_cfg = json.load(open(
                os.path.join(MODELS, "az_pauli_heavy_hex_27q.json")))
            cfg["trained_with"] = (
                "pauli_heavy_hex_27q: round-5 weight graft from the AZ "
                "flagship (scripts/graft_pauli_ppo.py — identical env "
                "config and policy architecture; measured better on the "
                "PPO artifact's own synth/eval protocol, evidence: "
                "runs-evidence/pauli_ppo_graft_r5.jsonl). Donor "
                "provenance: " + (az_cfg.get("trained_with") or "none"))
            with open(cfg_path, "w") as f:
                json.dump(cfg, f, indent=2)
            log_row({"tag": "shipped", "note": "graft wins, artifact "
                     "overwritten; donor az_pauli_heavy_hex_27q"})
        else:
            shutil.move(backup, ppo_pt)
            log_row({"tag": "not_shipped",
                     "note": "graft did not dominate; PPO weights kept"})
    os._exit(0)


if __name__ == "__main__":
    main()
