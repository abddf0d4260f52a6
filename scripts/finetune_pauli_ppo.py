#!/usr/bin/env python
"""Demo-BC finetune for pauli_heavy_hex_27q (PPO): lift verified synth d8.

The artifact's weakest QUALITY row is the Clifford-regime verified synth
round-trip at depth 8 (0.67-0.71 since r4). The round-5 graft experiment
(scripts/graft_pauli_ppo.py) showed the AZ flagship's weights reach 0.92
there but regress depth-4 solve and brevity, so a graft does not dominate.
This script takes the proven lever instead — planner-demo BC
(rl/demos.generate_demos), the same machinery that lifted
clifford_heavy_hex_27q d24 0.84 -> 0.98 in round 4 — applied to the PPO
artifact, and gates every snapshot on the artifact's OWN protocol:
verified synth d4/d8 (cliff_ck, the QUALITY table semantics) plus the
sampled best-of-10 evals. Only a snapshot that improves the d8 synth row
without regressing the others ships.

Usage: python scripts/finetune_pauli_ppo.py [minutes=40]
Evidence: runs-evidence/pauli_ppo_bc_r5.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qiskit_gym_tpu.rl import (POLICIES, AlphaZeroConfig, RLSynthesis,
                               fit_demos, generate_demos)
from qiskit_gym_tpu.rl.demos import prepare_demos
from qiskit_gym_tpu.utils.serialization import load_params

MODELS = os.path.join(os.path.dirname(__file__), "..", "examples", "models")
EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        "pauli_ppo_bc_r5.jsonl")
STEM = "pauli_heavy_hex_27q"


def log_row(row):
    row = {"t": round(time.time(), 1), **row}
    with open(EVIDENCE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    budget_s = 60 * (float(sys.argv[1]) if len(sys.argv) > 1 else 40.0)
    out_json = os.path.join(MODELS, f"{STEM}.json")
    out_pt = os.path.join(MODELS, f"{STEM}.pt")
    rls = RLSynthesis.from_config_json(out_json, out_pt)
    env = rls.env

    import bench_quality as bq
    from qiskit_gym_tpu.quantum import Circuit, Clifford

    def cliff_ck(out, t):
        return np.array_equal(Clifford(out).tableau, Clifford(t).tableau)

    # IN-MEMORY scoring through this rls object (bench_quality's
    # synth_quality/eval_artifact reload the artifact from DISK each call
    # and would measure the shipped weights, not the BC'd params — the
    # round-5 first run of this script shipped on exactly that noise)
    gs = env.gateset
    nq = env.config["num_qubits"]

    def score(num_targets=24, depths=(4, 8)):
        rows = []
        for depth in depths:
            rng = np.random.default_rng(99 + depth)
            ok, cx = 0, []
            for _ in range(num_targets):
                qc = Circuit(nq)
                for _ in range(depth):
                    name, qs = gs[rng.integers(len(gs))]
                    qc.append(name.lower(), tuple(int(q) for q in qs))
                out = rls.synth(qc, num_searches=32)
                if out is None or not cliff_ck(out, qc):
                    continue
                ok += 1
                cx.append(sum(1 for g in out if len(g[1]) == 2))
            rows.append({"difficulty": depth,
                         "solve_rate": ok / num_targets,
                         "mean_2q": float(np.mean(cx)) if cx
                         else float("nan")})
        return rows

    def eval_rows():
        return bq.eval_artifact(STEM, difficulties=[4, 8, 14],
                                num_episodes=128)

    # AZ-loss wrapper over the shipped PPO policy (the
    # finetune_clifford_27q_demos.py pattern); scoring goes through the
    # PPO artifact object so the measured path is exactly the QUALITY row
    full = json.load(open(out_json))
    pol_cls = full["policy_cls"].split(".")[-1]
    pol = POLICIES[pol_cls].from_json(full["policy"])
    pol = pol.with_updates(policy_cls=full["policy_cls"])
    bc = RLSynthesis(env, AlphaZeroConfig(num_episodes=8,
                                          num_mcts_searches=4, lr=1e-4),
                     pol, seed=11)
    algo = bc.algorithm
    algo.params = load_params(out_pt)

    # Clifford-regime demo corpus: difficulties below the rotation onset
    # (pauli_diff_scale) are pure-Clifford scrambles — exactly the regime
    # of the weak row — plus a band above it for rotation retention
    spec = env.spec
    spec.rng = np.random.default_rng(20260821)
    scale = int(getattr(env, "pauli_diff_scale", 16))
    difficulties = list(range(2, scale, 1)) + \
        list(range(scale, 2 * scale + 1, 2))
    t0 = time.time()
    demos = generate_demos(spec, difficulties, 900)
    log_row({"phase": "corpus", "episodes": demos["episodes"],
             "steps": int(demos["action"].shape[0]),
             "difficulties": f"2..{2 * scale}", "seed": 20260821,
             "gen_seconds": round(time.time() - t0, 1)})
    demos = prepare_demos(algo, demos)

    base_sy = score()
    base_ev = eval_rows()
    log_row({"phase": "baseline", "synth": base_sy, "evals": base_ev})
    best = base_sy
    best_params = algo.params
    shipped_d8 = base_sy[1]["solve_rate"]

    t0 = time.time()
    burst = 0
    while time.time() - t0 < budget_s:
        m = fit_demos(algo, demos, epochs=1, num_minibatches=32)
        rls.algorithm.params = algo.params
        sy = score()
        burst += 1
        keep = (sy[0]["solve_rate"] >= best[0]["solve_rate"] - 0.02
                and sy[1]["solve_rate"] > best[1]["solve_rate"])
        if keep:
            best = sy
            best_params = algo.params
        log_row({"phase": "burst", "burst": burst,
                 "bc_loss": round(float(m["loss"]), 4), "synth": sy,
                 "kept": keep,
                 "minutes": round((time.time() - t0) / 60, 1)})

    if best[1]["solve_rate"] > shipped_d8 and \
            best[0]["solve_rate"] >= base_sy[0]["solve_rate"] - 0.02:
        import shutil

        backup = out_pt + ".pre_bc"
        shutil.copyfile(out_pt, backup)
        rls.algorithm.params = best_params
        rls.algorithm.best_params = best_params
        rls.save(out_json, out_pt, best=True)
        # final eval sanity measures the artifact ON DISK — i.e. the
        # candidate just saved; restore the backup if evals regressed
        ev = eval_rows()
        ok = all(g["solve_rate"] >= b["solve_rate"] - 0.03
                 for g, b in zip(ev, base_ev))
        if not ok:
            shutil.move(backup, out_pt)
        else:
            os.remove(backup)
        if ok:
            prior = rls.trained_with
            rls.trained_with = (
                f"{STEM}: round-5 planner-demo BC finetune "
                f"(scripts/finetune_pauli_ppo.py) — verified synth d8 "
                f"{shipped_d8:.2f} -> {best[1]['solve_rate']:.2f} at d4 "
                f"{best[0]['solve_rate']:.2f} (evidence: runs-evidence/"
                f"pauli_ppo_bc_r5.jsonl). Prior provenance: "
                + (prior or "none recorded"))
            rls.save(out_json, out_pt, best=True)
            log_row({"phase": "final", "shipped": True, "synth": best,
                     "evals": ev})
        else:
            log_row({"phase": "final", "shipped": False, "evals": ev,
                     "note": "synth improved but evals regressed >3pts"})
    else:
        log_row({"phase": "final", "shipped": False,
                 "note": "no snapshot improved the d8 synth row"})
    os._exit(0)


if __name__ == "__main__":
    main()
