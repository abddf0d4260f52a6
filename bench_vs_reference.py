#!/usr/bin/env python
"""Head-to-head: our shipped artifacts vs the reference's shipped weights.

BASELINE.json's quality axis is "solve rate + 2q-gate count vs Rust ref".
The reference repo ships exactly three trained artifacts
(/root/reference/examples/models/{perm_square_3x3,lf_5_line,
clifford_3q_custom}.{json,pt}) — the only quantitative quality ground truth
it provides. This bench loads BOTH sides' weights and evaluates them on
IDENTICAL seeded targets with IDENTICAL search budgets through the same
solve engine (the reference checkpoints import unchanged —
tests/test_artifacts.py — so weight quality is the only variable; the Rust
runtime itself is not runnable here, see docs/PARITY.md).

Protocol, per config pair and target depth:
- targets are random circuits composed from the REFERENCE artifact's own
  gateset (home-field advantage to the reference: every target is exactly
  reachable in its action space; for perm/lf the gatesets are identical
  anyway, for clifford ours differs — each artifact solves the same
  abstract target in its own gateset),
- each side runs `synth(target, num_searches=100)` (reference default lane
  count, reference rl/configs.py:37-42) with its own env/weights,
- outputs are verified (permutation / GF(2) / tableau equality) before
  counting; solve rate over all targets, mean 2q over verified solutions.

Usage: python bench_vs_reference.py [--write] [--round TAG]
                                    [--targets N] [--searches N]
--write appends/replaces the "Head-to-head" section of docs/QUALITY.md.
"""

import json
import sys
import time

import numpy as np

from qiskit_gym_tpu.quantum import Circuit, Clifford, linear_from_circuit, \
    permutation_pattern
from qiskit_gym_tpu.rl import RLSynthesis

REF_MODELS = "/root/reference/examples/models"
OUR_MODELS = "examples/models"

SECTION_MARKER = "## Head-to-head vs the reference's shipped weights"


def _perm_ck(out, t):
    return permutation_pattern(linear_from_circuit(out)).tolist() == \
        permutation_pattern(linear_from_circuit(t)).tolist()


def _lf_ck(out, t):
    return np.array_equal(linear_from_circuit(out), linear_from_circuit(t))


def _cliff_ck(out, t):
    return np.array_equal(Clifford(out).tableau, Clifford(t).tableau)


PAIRS = [
    # (reference stem, our stem, checker, target depths)
    ("perm_square_3x3", "perm_grid_3x3", _perm_ck, [4, 8, 16]),
    ("lf_5_line", "lf_5_line", _lf_ck, [4, 8, 16]),
    # ours is trained on the REFERENCE's exact env config (gateset copied
    # verbatim) — examples/train_clifford_3q_custom.py
    ("clifford_3q_custom", "clifford_3q_custom", _cliff_ck, [4, 8, 16]),
]


def _random_target(gateset, num_qubits, depth, rng):
    qc = Circuit(num_qubits)
    for _ in range(depth):
        name, qs = gateset[rng.integers(len(gateset))]
        qc.append(name.lower(), tuple(int(q) for q in qs))
    return qc


def _count_2q(circ):
    return sum(1 for g in circ if len(g[1]) == 2)


def _optimal_table(our_stem, env):
    """Exact minimal-2q oracle over the config's full reachable group
    (scripts/optimal_bc.py: vectorized BFS / 0-1 Dial BFS over packed-int
    states, spec-twin-validated). Returns min_2q(env_state) or None when
    the group is not enumerable."""
    try:
        import os
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        from optimal_bc import exact_min_2q_table

        return exact_min_2q_table(our_stem, env)
    except Exception as e:  # pragma: no cover - diagnostic path
        print(f"[vs-ref] no optimal table for {our_stem}: {e}",
              file=sys.stderr)
        return None


def run_pair(ref_stem, our_stem, check, depths, num_targets=24,
             num_searches=100):
    ref = RLSynthesis.from_config_json(f"{REF_MODELS}/{ref_stem}.json",
                                       f"{REF_MODELS}/{ref_stem}.pt")
    ours = RLSynthesis.from_config_json(f"{OUR_MODELS}/{our_stem}.json",
                                        f"{OUR_MODELS}/{our_stem}.pt")
    ref_gs = ref.env.gateset
    nq = ref.env.config["num_qubits"]
    min_2q = _optimal_table(our_stem, ours.env)
    rows = []
    for depth in depths:
        rng = np.random.default_rng(4242 + depth)
        stats = {"ref": [0, []], "ours": [0, []]}
        opts = []
        for _ in range(num_targets):
            target = _random_target(ref_gs, nq, depth, rng)
            if min_2q is not None:
                # the env solves get_state(target) down to the identity and
                # the action path IS the circuit, so the state's exact
                # group distance = the minimal realizable 2q count
                opts.append(min_2q(ours.env.get_state(target)))
            for side, rls in (("ref", ref), ("ours", ours)):
                out = rls.synth(target, num_searches=num_searches)
                if out is None or not check(out, target):
                    continue
                stats[side][0] += 1
                stats[side][1].append(_count_2q(out))
        row = {"config": ref_stem, "depth": depth,
               "opt_2q": float(np.mean(opts)) if opts else float("nan")}
        for side in ("ref", "ours"):
            ok, cx = stats[side]
            row[f"{side}_solve"] = ok / num_targets
            row[f"{side}_2q"] = float(np.mean(cx)) if cx else float("nan")
        rows.append(row)
        print(f"[vs-ref] {ref_stem} d{depth}: opt {row['opt_2q']:.1f}  "
              f"ref {row['ref_solve']:.2f}/{row['ref_2q']:.1f}  "
              f"ours {row['ours_solve']:.2f}/{row['ours_2q']:.1f}",
              file=sys.stderr, flush=True)
    return rows


def format_section(all_rows, round_tag, hw, num_targets, num_searches):
    lines = [
        SECTION_MARKER, "",
        "Both sides' shipped weights evaluated on IDENTICAL seeded targets",
        "(random circuits from the REFERENCE artifact's own gateset — its",
        "home field) with identical budgets: synth(num_searches="
        f"{num_searches}),",
        f"{num_targets} targets per depth, verified outputs only, through",
        "the same solve engine (the reference .pt/.json load unchanged;",
        "tests/test_artifacts.py). Reference weights:",
        "/root/reference/examples/models/*.{json,pt} — the only",
        "quantitative quality ground truth the reference publishes.",
        "The `optimal 2q` column is the EXACT minimum over the config's",
        "fully enumerated state group (scripts/optimal_bc.py: BFS /",
        "0-1 Dial BFS over all reachable states) — the provable floor",
        "for both sides on these exact targets.",
        f"Provenance: {hw} · {round_tag} · seeds 4242+depth.", "",
        "| config | target depth | optimal 2q | ref solve | ref 2q "
        "| ours solve | ours 2q |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in all_rows:
        lines.append(
            f"| {r['config']} | {r['depth']} | "
            f"{r.get('opt_2q', float('nan')):.1f} | "
            f"{r['ref_solve']:.2f} | {r['ref_2q']:.1f} | "
            f"{r['ours_solve']:.2f} | {r['ours_2q']:.1f} |")
    return "\n".join(lines) + "\n"


def write_section(path, section):
    """Append the section, replacing any previous copy (it is the last
    aside of the file it owns; everything after the marker up to the next
    '## ' heading is replaced)."""
    with open(path) as f:
        text = f.read()
    if SECTION_MARKER in text:
        start = text.index(SECTION_MARKER)
        after = text.find("\n## ", start + 1)
        tail = "" if after < 0 else text[after + 1:]
        text = text[:start] + section + tail
    else:
        text = text.rstrip("\n") + "\n\n" + section
    with open(path, "w") as f:
        f.write(text)


def main():
    t0 = time.time()
    round_tag = "r5"
    if "--round" in sys.argv:
        round_tag = sys.argv[sys.argv.index("--round") + 1]
    num_targets = 24
    if "--targets" in sys.argv:
        num_targets = int(sys.argv[sys.argv.index("--targets") + 1])
    num_searches = 100
    if "--searches" in sys.argv:
        num_searches = int(sys.argv[sys.argv.index("--searches") + 1])
    import jax

    plat = jax.devices()[0].platform
    hw = {"axon": "TPU v5e", "tpu": "TPU v5e", "cpu": "CPU"}.get(plat, plat)

    all_rows = []
    for ref_stem, our_stem, check, depths in PAIRS:
        all_rows += run_pair(ref_stem, our_stem, check, depths,
                             num_targets=num_targets,
                             num_searches=num_searches)
    section = format_section(all_rows, round_tag, hw, num_targets,
                             num_searches)
    print(section)
    print(json.dumps({"rows": all_rows}))
    print(f"(total {time.time() - t0:.0f}s)", file=sys.stderr)
    if "--write" in sys.argv:
        write_section("docs/QUALITY.md", section)


if __name__ == "__main__":
    main()
