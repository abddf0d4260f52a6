#!/usr/bin/env python
"""Solve-quality benchmark: success rate and 2q-gate counts on the shipped
artifacts (BASELINE.json quality axis: "solve rate + 2q-gate count").

For each artifact: reset E targets at each difficulty on device, run the
configured solve, and report success rate + mean 2q-gate count of solutions.
Prints a markdown table; writes docs/QUALITY.md when --write is passed.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.rl import RLSynthesis
from qiskit_gym_tpu.rl.rollout import collect


def eval_artifact(name, difficulties, num_episodes=256, num_searches=10,
                  mcts: int = 0):
    rls = RLSynthesis.from_config_json(f"examples/models/{name}.json",
                                       f"examples/models/{name}.pt")
    algo = rls.algorithm
    core = algo.core
    rows = []
    for diff in difficulties:
        T = min(core.depth_slope * diff, core.max_depth)
        key = jax.random.key(1234 + diff)
        k_reset, k_roll = jax.random.split(key)
        state = core.reset(k_reset, num_episodes, diff)
        state = jax.tree.map(lambda x: jnp.repeat(x, num_searches, axis=0),
                             state)
        if mcts > 0:
            from qiskit_gym_tpu.rl.az import collect_mcts

            final, _ = jax.jit(lambda s, k: collect_mcts(
                core, algo.policy.apply, algo.params, s, k, T,
                num_sims=mcts, c_puct=1.41))(state, k_roll)
        else:
            final, _ = jax.jit(lambda s, k: collect(
                core, algo.policy.apply, algo.params, s, k, T))(state, k_roll)
        success = np.asarray(final.success).reshape(num_episodes, num_searches)
        cnots = np.asarray(final.n_cnots).reshape(num_episodes, num_searches)
        solved = success.any(axis=1)
        # best (fewest 2q) among successful searches per target
        masked = np.where(success, cnots, np.iinfo(np.int32).max)
        best = masked.min(axis=1)[solved]
        rows.append({
            "difficulty": diff,
            "solve_rate": float(solved.mean()),
            "mean_2q": float(best.mean()) if solved.any() else float("nan"),
        })
    return rows


def main():
    t0 = time.time()
    report = {}
    report["perm_grid_3x3 (PPO, 10 searches)"] = eval_artifact(
        "perm_grid_3x3", [4, 8, 16, 24])
    report["lf_5_line (PPO, 10 searches)"] = eval_artifact(
        "lf_5_line", [4, 8, 16, 24])
    report["clifford_3q_line (PPO, 10 searches)"] = eval_artifact(
        "clifford_3q_line", [4, 8, 16, 24])
    report["perm_heavy_hex_27q (PPO, 10 searches)"] = eval_artifact(
        "perm_heavy_hex_27q", [8, 16, 32], num_episodes=128)
    report["clifford_heavy_hex_27q (PPO, 10 searches)"] = eval_artifact(
        "clifford_heavy_hex_27q", [8, 16, 24], num_episodes=128)
    report["pauli_5_line (PPO, 10 searches)"] = eval_artifact(
        "pauli_5_line", [16, 32, 64, 128], num_episodes=128)
    report["pauli_12_line (PPO, 10 searches)"] = eval_artifact(
        "pauli_12_line", [4, 8, 16, 24], num_episodes=128)
    report["pauli_heavy_hex_27q (PPO, 10 searches)"] = eval_artifact(
        "pauli_heavy_hex_27q", [4, 8, 14], num_episodes=128)
    report["az_perm_grid_3x3 (MCTS-64, 2 searches)"] = eval_artifact(
        "az_perm_grid_3x3", [4, 8, 16], num_episodes=64, num_searches=2,
        mcts=64)
    report["az_perm_heavy_hex_27q (MCTS-96, 1 search)"] = eval_artifact(
        "az_perm_heavy_hex_27q", [4, 8], num_episodes=64, num_searches=1,
        mcts=96)
    report["az_clifford_heavy_hex_27q (MCTS-48, 1 search)"] = eval_artifact(
        "az_clifford_heavy_hex_27q", [8, 16, 32], num_episodes=64,
        num_searches=1, mcts=48)

    lines = ["# Solve quality (shipped artifacts, one v5e chip)", "",
             "Scrambles drawn by the env at each difficulty; solve rate over",
             "fresh targets; 2q count = best solution per solved target.", ""]
    lines += ["| artifact | difficulty | solve rate | mean 2q gates |",
              "|---|---|---|---|"]
    for name, rows in report.items():
        for r in rows:
            lines.append(f"| {name} | {r['difficulty']} | "
                         f"{r['solve_rate']:.2f} | {r['mean_2q']:.1f} |")
    out = "\n".join(lines) + "\n"
    print(out)
    print(f"(total {time.time() - t0:.0f}s)", file=sys.stderr)
    if "--write" in sys.argv:
        with open("docs/QUALITY.md", "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
