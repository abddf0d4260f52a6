"""JsonlLogger + end-of-learn run-state markers (utils/logging.py).

The reference's observability is TensorBoard-only (reference
rl/synthesis.py:129-132); here the torch-free JSONL writer is primary and
must leave run directories self-describing — in particular a terminal note
when a run ends in the entropy-collapsed state (docs/TRAINING.md)."""

import json

from qiskit_gym_tpu.utils.logging import (JsonlLogger, MultiWriter,
                                          write_learn_end_note)


def _read(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_jsonl_logger_rows_and_note(tmp_path):
    with JsonlLogger(str(tmp_path)) as log:
        log.add_scalar("loss", 0.5, 1)
        log.add_scalar("success_rate", 1.0, 1)
        log.add_scalar("loss", 0.25, 2)  # new step flushes step 1
        log.add_note("done", 2)
    rows = _read(tmp_path / "metrics.jsonl")
    assert rows[0] == {"step": 1, "loss": 0.5, "success_rate": 1.0}
    assert rows[1] == {"step": 2, "loss": 0.25}  # flushed by add_note
    assert rows[2] == {"step": 2, "note": "done"}


def test_learn_end_note_collapsed_vs_healthy(tmp_path):
    log = JsonlLogger(str(tmp_path))
    # collapsed ending: zero success with a proven snapshot in hand
    write_learn_end_note(MultiWriter(log), 10, difficulty=8,
                         best_difficulty=7,
                         last_metrics={"success_rate": 0.0},
                         has_best_snapshot=True)
    # healthy ending
    write_learn_end_note(log, 20, difficulty=4, best_difficulty=4,
                         last_metrics={"success_rate": 0.9},
                         has_best_snapshot=True)
    # writers without add_note (e.g. bare TensorBoard) are a no-op
    write_learn_end_note(object(), 30, 1, 1, {}, False)
    log.close()
    rows = _read(tmp_path / "metrics.jsonl")
    assert len(rows) == 2
    assert "entropy-collapse" in rows[0]["note"]
    assert "best=True snapshot @ difficulty 7" in rows[0]["note"]
    assert "entropy-collapse" not in rows[1]["note"]
    assert "best_difficulty=4" in rows[1]["note"]


def test_learn_end_note_run_path_overwrites_single_summary(tmp_path):
    """Drivers call learn() in a while loop; with run_path the marker must
    keep ONE current run_summary.json (overwrite), not spam metrics.jsonl
    with a note per chunk."""
    log = JsonlLogger(str(tmp_path))
    for step, sr in ((10, 0.0), (20, 0.9)):   # mid-run dip, then recovery
        write_learn_end_note(log, step, difficulty=8, best_difficulty=7,
                             last_metrics={"success_rate": sr},
                             has_best_snapshot=True,
                             run_path=str(tmp_path))
    log.close()
    rows = _read(tmp_path / "metrics.jsonl")
    assert all("note" not in r for r in rows)          # no jsonl spam
    summary = json.load(open(tmp_path / "run_summary.json"))
    assert summary["step"] == 20                       # latest state wins
    assert summary["collapsed_at_end"] is False
    assert "entropy-collapse" not in summary["note"]


def test_learn_writes_run_summary(tmp_path):
    """End-to-end: learn(tb_path=...) leaves a current run_summary.json in
    the run dir (and no per-chunk note spam in metrics.jsonl)."""
    from qiskit_gym_tpu.envs import PermutationGym
    from qiskit_gym_tpu.rl import BasicPolicyConfig, PPOConfig, RLSynthesis

    gym = PermutationGym.from_coupling_map([(0, 1), (1, 2)])
    cfg = PPOConfig(num_episodes=8, num_epochs=1, evals={})
    rls = RLSynthesis(gym, cfg, BasicPolicyConfig(
        embedding_size=8, common_layers=[8], policy_layers=[8],
        value_layers=[8]))
    for _ in range(2):  # driver-style chunked learn() calls
        rls.learn(initial_difficulty=1, num_iterations=1,
                  tb_path=str(tmp_path))
    summary = json.load(open(tmp_path / "run_summary.json"))
    assert summary["step"] == 2
    rows = _read(tmp_path / "metrics.jsonl")
    assert rows and all("note" not in r for r in rows)
