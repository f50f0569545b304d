#!/bin/bash
# One-command round validation: everything the driver gates on.
#   1. sbt -batch test            (BASELINE verification entry point)
#   2. Verify + DuckDB oracle     (the correctness gate, sf0.01)
#   3. Bench                      (BENCH_r{N}.json preview, sf0.1 —
#      includes the N->4N scaling legs in fresh per-leg JVMs since r2)
# Run on a QUIET box: concurrent sbt/spark work contaminates the legs.
set -e
cd "$(dirname "$0")/.."
echo "== tests =="
sbt -batch test 2>&1 | grep -E "Tests:|All tests|TEST FAILED" | tail -2
echo "== verify + oracle (sf0.01) =="
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/round_check" \
  2>&1 | grep -E "\[verify\].*failed" || true
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/round_check | tail -1
echo "== bench (sf0.1) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -o '{"metric".*}' | head -c 2400
echo
