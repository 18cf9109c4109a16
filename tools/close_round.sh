#!/usr/bin/env bash
# Round-close evidence runner (VERDICT r8 task 3; gate added round 12
# per VERDICT r11 item 2): run the bench at the round's scale factor
# WITHOUT auto-committing, gate the result on adjudicated-only flags,
# and only then commit the evidence. A final BENCH_*/BENCH_DETAIL
# whose regressions are unadjudicated (no byte-identical-shuffle
# noise signature AND no SCALE_NOTES.md entry) never reaches the
# history — the r11 headline/SCALE_NOTES self-contradiction class.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-$(nproc)}"

# Pre-sweep: commit the PREVIOUS round's driver-written artifacts so
# they aren't mixed into this run's evidence commit.
pre=$(git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
    'BENCH_DETAIL*.json' 'BENCH_SHUFFLE.json' 'SCALE_NOTES.md' || true)
if [ -n "$pre" ]; then
    git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_DETAIL*.json \
        BENCH_SHUFFLE.json SCALE_NOTES.md 2>/dev/null || true
    git commit -q -m "Bench evidence refresh (pre-run leftovers)" \
        -- BENCH_r*.json CORRECTNESS_r*.json BENCH_DETAIL*.json \
        BENCH_SHUFFLE.json SCALE_NOTES.md || true
fi

# Gate: the window rotation ledger must reflect every recorded
# CORRECTNESS_r*.json — a close with a stale rotation (first-timers
# left outside the driver window) is the r12 VERDICT item-1 class.
python tools/rotate_window.py --check

# The bench itself must not auto-commit: the gate decides.
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_NO_EVIDENCE_COMMIT=1 python bench.py

# Gate: refuse to commit a final bench with unadjudicated flags.
python tools/bench_gate.py

# Final sweep: stage-and-commit the evidence (pathspec-limited —
# never touches source files).
evidence=$(git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
    'BENCH_DETAIL*.json' 'BENCH_SHUFFLE.json' 'SCALE_NOTES.md' || true)
if [ -n "$evidence" ]; then
    git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_DETAIL*.json \
        BENCH_SHUFFLE.json SCALE_NOTES.md 2>/dev/null || true
    git commit -q -m "Round-close bench evidence (gated)" -- BENCH_r*.json \
        CORRECTNESS_r*.json BENCH_DETAIL*.json BENCH_SHUFFLE.json \
        SCALE_NOTES.md
    echo "evidence committed (gate clean)" >&2
else
    echo "evidence already clean" >&2
fi
