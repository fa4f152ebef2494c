#!/usr/bin/env bash
# Run every gate locally, in driver order: tests → correctness (verify +
# DuckDB oracle self-check) → bench. Exits non-zero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1/3 sbt test ==="
sbt -batch test

echo "=== 2/3 verify + oracle (sf0.01) ==="
OUT=$(mktemp -d)/verify
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"
python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT"

echo "=== 3/3 bench (sf0.1) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench"
