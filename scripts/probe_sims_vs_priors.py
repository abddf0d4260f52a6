#!/usr/bin/env python
"""Sims-vs-priors probe: is the plateau search-bound or priors-bound?

Measures argmax single-search MCTS evals of the shipped full-gateset 27q
Pauli artifact at several simulation budgets and difficulties. If a KxX
bigger tree lifts the solve rate by much less than Kx, the binding
constraint is the policy priors (what the demonstration bootstrap
targets), not search depth — the round-3 measurement this reproduces is
quoted in docs/TRAINING.md "Sims-vs-priors".

Writes runs-evidence/probe_sims_vs_priors_<tag>.json (committed evidence).

Usage: python scripts/probe_sims_vs_priors.py [tag=r4] [episodes=32]
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

MODELS = os.path.join(os.path.dirname(__file__), "..", "examples", "models")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r4"
    episodes = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    name = "az_pauli_heavy_hex_27q_full"
    rls = RLSynthesis.from_config_json(
        os.path.join(MODELS, f"{name}.json"),
        os.path.join(MODELS, f"{name}.pt"))
    algo = rls.algorithm
    core = algo.core

    rows = []
    for difficulty in (8, 12):
        T = min(core.depth_slope * difficulty, core.max_depth)
        for sims in (96, 256, 512):
            key = jax.random.key(4321 + difficulty)
            k_reset, k_roll = jax.random.split(key)
            state = core.reset(k_reset, episodes, difficulty)
            t0 = time.time()
            final, _ = jax.jit(lambda s, k, S=sims: collect_mcts(
                core, algo.policy.apply, algo.params, s, k, T,
                num_sims=S, c_puct=1.41, deterministic=True))(state, k_roll)
            rate = float(np.asarray(final.success).mean())
            rows.append({"difficulty": difficulty, "sims": sims,
                         "argmax_solve_rate": rate, "episodes": episodes,
                         "seconds": round(time.time() - t0, 1)})
            print(rows[-1], flush=True)

    out = {
        "artifact": name,
        "tag": tag,
        "mode": "argmax single-search MCTS eval (deterministic)",
        "hardware": jax.devices()[0].device_kind,
        "seed": "jax.random.key(4321 + difficulty)",
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "runs-evidence",
                        f"probe_sims_vs_priors_{tag}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
