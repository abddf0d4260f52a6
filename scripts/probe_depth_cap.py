#!/usr/bin/env python
"""Measure the MCTS tree-depth cap at deep horizons (VERDICT r4 Weak #5).

rl/az.py caps selection depth at min(T, 32) ("deeper than ~32 is
vanishingly rare") — asserted, not measured, in exactly the regime where
BASELINE #5 runs difficulty-32 episodes with horizon 64 and the d24/d32
Pauli rows live (mean 17.5 SWAPs at d32, docs/QUALITY.md). This probe
drives collect_mcts directly with search_depth 32 vs 64 on env-drawn
scrambles (the argmax eval semantics of the QUALITY tables) and reports
solve rate / mean 2q / seconds per setting, so the cap line can cite a
measurement.

Usage: python scripts/probe_depth_cap.py [num_episodes]
Writes rows to runs-evidence/depth_cap_r5.jsonl and prints them.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.rl import RLSynthesis
from qiskit_gym_tpu.rl.az import collect_mcts

EVIDENCE = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        "depth_cap_r5.jsonl")

CASES = [
    # (artifact stem, difficulties, mcts sims)
    ("az_pauli_heavy_hex_27q", [24, 32], 96),
    ("az_perm_heavy_hex_27q", [32], 96),
]


def log_row(row):
    row = {"t": round(time.time(), 1), **row}
    with open(EVIDENCE, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    for stem, diffs, sims in CASES:
        rls = RLSynthesis.from_config_json(f"examples/models/{stem}.json",
                                           f"examples/models/{stem}.pt")
        algo = rls.algorithm
        core = algo.core
        for diff in diffs:
            T = min(core.depth_slope * diff, core.max_depth)
            key = jax.random.key(1234 + diff)
            k_reset, k_roll = jax.random.split(key)
            state = core.reset(k_reset, E, diff)
            for cap in (32, 64):
                fn = jax.jit(lambda s, k, _cap=cap: collect_mcts(
                    core, algo.policy.apply, algo.params, s, k, T,
                    num_sims=sims, c_puct=1.41, deterministic=True,
                    search_depth=min(T, _cap)))
                final, _ = fn(state, k_roll)  # compile + run
                jax.block_until_ready(final.success)
                t0 = time.time()
                final, _ = fn(state, jax.random.fold_in(k_roll, 1))
                success = np.asarray(final.success)
                cnots = np.asarray(final.n_cnots)
                dt = time.time() - t0
                log_row({
                    "artifact": stem, "difficulty": diff, "cap": cap,
                    "horizon": T, "sims": sims, "episodes": E,
                    "solve_rate": round(float(success.mean()), 4),
                    "mean_2q": (round(float(cnots[success].mean()), 2)
                                if success.any() else None),
                    "seconds": round(dt, 1),
                })
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
