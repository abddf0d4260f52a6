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
#   4. bench_quality.py --write           (refresh docs/QUALITY.md)
#   5. bench_baseline5.py --write         (32-deep chunked-search rows)
set -u
cd "$(dirname "$0")/.."
MIN="${1:-120}"
SIMS="${2:-192}"
LOG=runs/runbook
mkdir -p "$LOG"

if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
  echo "runbook: relay DEAD (no listener on 127.0.0.1:8082) — aborting" >&2
  exit 1
fi
echo "runbook: relay alive; starting (train ${MIN}min @ ${SIMS} sims)"

echo "== step 2: bench.py"
timeout 3600 python bench.py 2>&1 | tee "$LOG/bench.log"

echo "== step 3: resume 27q full-gateset AZ (${MIN} min, ${SIMS} sims)"
timeout $(( (MIN + 30) * 60 )) python examples/train_pauli_27q_full_az.py \
  "$MIN" "$SIMS" 2>&1 | tee "$LOG/train27q_full.log"

echo "== step 4: quality refresh"
timeout 14400 python bench_quality.py --write 2>&1 | tee "$LOG/quality.log"

echo "== step 5: BASELINE config #5 (32-deep chunked search)"
timeout 14400 python bench_baseline5.py --write 2>&1 | tee "$LOG/baseline5.log"

echo "runbook: done"
