#!/usr/bin/env bash
# Chip-recovery runbook (docs/BACKLOG.md "Pending one free TPU chip"),
# automated so a returning TPU relay gets used immediately and safely:
# every step is timeout-bounded and strictly serial (ONE TPU client at a
# time — a second client wedges the axon relay; see docs/BACKLOG.md).
#
# Usage: scripts/chip_runbook.sh [train_minutes] [train_sims]
#   train_minutes  budget for resuming the 27q full-gateset AZ run (default 120)
#   train_sims     MCTS sims at the frontier (default 192)
#
# Steps (each logged under runs/runbook/):
#   1. probe the relay port (5s bound) — abort if dead
#   2. bench.py               -> green headline number
#   3. resume train_pauli_27q_full_az.py  (difficulty-8 frontier)
#   4. bench_quality.py --write --baseline5
#      (quality tables + BASELINE #5 rows in one pass: the combined flag
#      replaces the old section instead of accumulating duplicates)
#
# Failure policy: the probe and bench.py gate everything (a dead/flaky
# relay must not burn hours of dependent steps); quality steps run even if
# training hit its timeout (partial training still moved the artifact).
set -u -o pipefail
cd "$(dirname "$0")/.."
MIN="${1:-120}"
SIMS="${2:-192}"
PORT="${QGT_RELAY_PORT:-8082}"
LOG=runs/runbook
mkdir -p "$LOG"

if ! timeout 5 bash -c "echo > /dev/tcp/127.0.0.1/$PORT" 2>/dev/null; then
  echo "runbook: relay DEAD (no listener on 127.0.0.1:$PORT) — aborting" >&2
  exit 1
fi
echo "runbook: relay alive; starting (train ${MIN}min @ ${SIMS} sims)"

echo "== step 2: bench.py"
if ! timeout 3600 python bench.py 2>&1 | tee "$LOG/bench.log"; then
  echo "runbook: bench.py FAILED — relay unhealthy, aborting before the" \
       "long steps (see $LOG/bench.log)" >&2
  exit 1
fi

echo "== step 3: resume 27q full-gateset AZ (${MIN} min, ${SIMS} sims)"
if ! timeout $(( (MIN + 30) * 60 )) python examples/train_pauli_27q_full_az.py \
    "$MIN" "$SIMS" 2>&1 | tee "$LOG/train27q_full.log"; then
  echo "runbook: training step did not exit cleanly (timeout or error);" \
       "artifacts save every iteration — continuing to quality" >&2
fi

echo "== step 4: quality refresh + BASELINE config #5 (32-deep search)"
if ! timeout 28800 python bench_quality.py --write --baseline5 \
    2>&1 | tee "$LOG/quality.log"; then
  echo "runbook: quality refresh FAILED (see $LOG/quality.log)" >&2
  exit 1
fi

echo "runbook: done"
