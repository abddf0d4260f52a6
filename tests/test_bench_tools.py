"""Host-side behavior of the bench tooling (no device work).

bench_quality.py --write --only patches rows of an existing
docs/QUALITY.md in place; a wrong splice would silently corrupt the
quality tables the judge and the docs rely on.
"""

import importlib
import sys


def _load_bench_quality():
    sys.path.insert(0, ".")
    return importlib.import_module("bench_quality")


DOC = """# Solve quality

| artifact | difficulty | solve rate | mean 2q gates | provenance |
|---|---|---|---|---|
| alpha (PPO) | 4 | 1.00 | 3.0 | sampled · CPU · r3 |
| alpha (PPO) | 8 | 0.90 | 5.0 | sampled · CPU · r3 |
| beta (MCTS) | 4 | 0.80 | 4.0 | argmax · CPU · r3 |

## synth() round-trips

| artifact | target depth | verified solve rate | mean 2q gates | provenance |
|---|---|---|---|---|
| alpha | 4 | 1.00 | 2.0 | synth · CPU · r3 |

## BASELINE config #5

| difficulty | verified solve rate | mean SWAPs | mean 2q | seconds/target |
|---|---|---|---|---|
| 8 | 1.00 | 6.8 | 20.2 | 156.5 |
"""


def test_patch_rows_replaces_in_place(tmp_path):
    bq = _load_bench_quality()
    path = tmp_path / "QUALITY.md"
    path.write_text(DOC)
    bq._patch_rows(str(path), {
        "beta (MCTS)": ["| beta (MCTS) | 4 | 0.95 | 3.5 | argmax · TPU · r4 |",
                        "| beta (MCTS) | 12 | 0.88 | 9.0 | argmax · TPU · r4 |"],
    })
    out = path.read_text()
    # old beta row gone, both new rows where it was (before the synth table)
    assert "| beta (MCTS) | 4 | 0.80" not in out
    assert out.index("| beta (MCTS) | 4 | 0.95") < out.index("## synth()")
    assert out.index("| beta (MCTS) | 12 | 0.88") < out.index("## synth()")
    # untouched rows and sections survive byte-identically
    assert "| alpha (PPO) | 8 | 0.90 | 5.0 | sampled · CPU · r3 |" in out
    assert "| alpha | 4 | 1.00 | 2.0 | synth · CPU · r3 |" in out
    assert "## BASELINE config #5" in out
    assert "| 8 | 1.00 | 6.8 | 20.2 | 156.5 |" in out


def test_only_filter_exact_and_substring():
    bq = _load_bench_quality()
    stems = ["az_pauli_heavy_hex_27q", "az_pauli_heavy_hex_27q_dense",
             "az_pauli_heavy_hex_27q_full", "lf_5_line"]
    # substring mode matches the whole prefix family
    sub = [s for s in stems if bq._only_matches("az_pauli_heavy_hex_27q", s)]
    assert sub == stems[:3]
    # '=' selects exactly one stem even when it prefixes siblings
    exact = [s for s in stems if bq._only_matches("=az_pauli_heavy_hex_27q", s)]
    assert exact == ["az_pauli_heavy_hex_27q"]
    # no filter selects everything
    assert all(bq._only_matches(None, s) for s in stems)


def test_patch_rows_appends_unknown_label(tmp_path):
    bq = _load_bench_quality()
    path = tmp_path / "QUALITY.md"
    path.write_text(DOC)
    bq._patch_rows(str(path), {
        "gamma (new)": ["| gamma (new) | 4 | 0.50 | 7.0 | argmax · TPU · r4 |"],
    })
    out = path.read_text()
    assert "| gamma (new) | 4 | 0.50" in out
    # existing content intact
    assert "| beta (MCTS) | 4 | 0.80" in out


def test_vs_reference_section_write_and_replace(tmp_path):
    import importlib

    sys.path.insert(0, ".")
    bvr = importlib.import_module("bench_vs_reference")
    path = tmp_path / "QUALITY.md"
    path.write_text(DOC)
    rows = [{"config": "lf_5_line", "depth": 8, "opt_2q": 4.8,
             "ref_solve": 1.0, "ref_2q": 5.0, "ours_solve": 1.0,
             "ours_2q": 4.9}]
    sec = bvr.format_section(rows, "r5", "CPU", 24, 100)
    bvr.write_section(str(path), sec)
    out = path.read_text()
    assert bvr.SECTION_MARKER in out
    assert "| lf_5_line | 8 | 4.8 | 1.00 | 5.0 | 1.00 | 4.9 |" in out
    # prior sections intact
    assert "## BASELINE config #5" in out
    # re-write replaces, not duplicates
    rows[0]["ours_2q"] = 4.5
    bvr.write_section(str(path),
                     bvr.format_section(rows, "r5", "CPU", 24, 100))
    out2 = path.read_text()
    assert out2.count(bvr.SECTION_MARKER) == 1
    assert "| lf_5_line | 8 | 4.8 | 1.00 | 5.0 | 1.00 | 4.5 |" in out2
    assert "| lf_5_line | 8 | 4.8 | 1.00 | 5.0 | 1.00 | 4.9 |" not in out2
