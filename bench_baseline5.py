#!/usr/bin/env python
"""BASELINE.json config #5 at its stated scale.

"27q heavy-hex permutation routing, AlphaZero synth with 1000-search
batched MCTS" — the reference's AZ defaults (`num_mcts_searches=1000`,
PUCT C=1.41, reference rl/configs.py:355-357) driven through
`RLSynthesis.synth(target, num_searches>=100, num_mcts_searches=1000)`.

Every decision of every search episode runs a 1000-simulation batched
array-MCTS on device; `num_searches` whole episodes run as batched lanes
and the best solution is kept (reference EvalConfig semantics,
configs.py:25-35). Reports solve rate, 2q (=SWAP) counts, and wall-clock
per target; `--write` appends the rows to docs/QUALITY.md.

Usage: python bench_baseline5.py [--write] [--quick] [--targets N]
       [--note TEXT]

--write REPLACES an existing "BASELINE config #5" section in
docs/QUALITY.md (appends if none). --targets overrides the per-difficulty
target count (default 8; --quick = 3 targets at difficulty 16 only).
--note adds a provenance line under the section header (e.g. the hardware
the rows were measured on).
"""

import os
import sys
import time

import numpy as np

from qiskit_gym_tpu.quantum import linear_from_circuit, permutation_pattern
from qiskit_gym_tpu.rl import RLSynthesis


def main():
    quick = "--quick" in sys.argv
    num_targets = 3 if quick else 8
    if "--targets" in sys.argv:
        num_targets = int(sys.argv[sys.argv.index("--targets") + 1])
    note = None
    if "--note" in sys.argv:
        note = sys.argv[sys.argv.index("--note") + 1]
    num_searches = 100
    num_mcts = 1000

    rls = RLSynthesis.from_config_json(
        "examples/models/az_perm_heavy_hex_27q.json",
        "examples/models/az_perm_heavy_hex_27q.pt")
    env = rls.env
    n = env.config["num_qubits"]

    rows = []
    for difficulty in ([16] if quick else [8, 16, 32]):
        rng = np.random.default_rng(1234 + difficulty)
        ok, cx, secs = 0, [], []
        for _ in range(num_targets):
            # scramble-by-difficulty target: random walk over the gateset
            # (the env's own reset distribution, reproducible host-side)
            perm = np.arange(n)
            for _ in range(difficulty):
                _, (a, b) = env.gateset[rng.integers(len(env.gateset))]
                perm[[a, b]] = perm[[b, a]]
            t0 = time.time()
            out = rls.synth(perm.tolist(), num_searches=num_searches,
                            num_mcts_searches=num_mcts)
            secs.append(time.time() - t0)
            if out is None:
                continue
            got = permutation_pattern(linear_from_circuit(out)).tolist()
            if got != perm.tolist():
                continue
            ok += 1
            cx.append(3 * len(out))  # SWAP = 3 CX (reference metrics.rs:64)
        rows.append({
            "difficulty": difficulty,
            "solve_rate": ok / num_targets,
            "mean_swaps": float(np.mean(cx)) / 3 if cx else float("nan"),
            "mean_2q": float(np.mean(cx)) if cx else float("nan"),
            "mean_seconds": float(np.mean(secs)),
        })
        print(rows[-1], flush=True)

    lines = ["", "## BASELINE config #5: 27q heavy-hex permutation, AZ synth",
             "with the reference defaults (num_searches=100 episode lanes,",
             "num_mcts_searches=1000 sims/decision, C=1.41) — verified",
             "round-trips only."]
    if note:
        lines += ["", note]
    lines += ["",
              "| difficulty | verified solve rate | mean SWAPs | mean 2q "
              "| seconds/target |", "|---|---|---|---|---|"]
    for r in rows:
        lines.append(f"| {r['difficulty']} | {r['solve_rate']:.2f} | "
                     f"{r['mean_swaps']:.1f} | {r['mean_2q']:.1f} | "
                     f"{r['mean_seconds']:.1f} |")
    out = "\n".join(lines) + "\n"
    print(out)
    if "--write" in sys.argv:
        # replace an existing section (it is always the last one in the
        # file) instead of appending a duplicate
        marker = "\n## BASELINE config #5"
        try:
            with open("docs/QUALITY.md") as f:
                prev = f.read()
        except FileNotFoundError:
            prev = ""
        if marker in prev:
            prev = prev[:prev.index(marker)]
        with open("docs/QUALITY.md", "w") as f:
            f.write(prev + out)
    os._exit(0)  # axon teardown otherwise hangs ~90 s


if __name__ == "__main__":
    main()
