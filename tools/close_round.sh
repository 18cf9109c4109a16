#!/usr/bin/env bash
# Round-close evidence runner (VERDICT r8 task 3): run the bench at
# the round's scale factor, then make sure every evidence artifact is
# committed. bench.py already auto-commits evidence pre- and post-run
# (see bench.py:_commit_evidence); this wrapper exists for manual
# round closes and as a final sweep for artifacts written AFTER the
# bench (e.g. a driver correctness file landing later — rerun this
# script or rely on the next bench's pre-run commit).
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-$(nproc)}"

SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" python bench.py

# Final sweep: stage-and-commit any evidence still dirty (pathspec-
# limited — never touches source files).
evidence=$(git status --porcelain -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
    'BENCH_DETAIL*.json' 'BENCH_SHUFFLE.json' 'SCALE_NOTES.md' || true)
if [ -n "$evidence" ]; then
    git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_DETAIL*.json \
        BENCH_SHUFFLE.json SCALE_NOTES.md 2>/dev/null || true
    git commit -q -m "Round-close bench evidence" -- BENCH_r*.json \
        CORRECTNESS_r*.json BENCH_DETAIL*.json BENCH_SHUFFLE.json \
        SCALE_NOTES.md
    echo "evidence committed" >&2
else
    echo "evidence already clean" >&2
fi
