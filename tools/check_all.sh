#!/bin/sh
# The whole round gate in one command. Order: fast failure first.
#   1. pytest           — unit/integration incl. the plan-audit hard gate
#   2. oracle @ sf0.01  — the driver's correctness domain (hash-strict)
#   3. oracle @ sf0.1   — 10x scale parity (log under tools/gatelogs/)
#   4. fuzzer @ sf0.1   — differential sweep at 100x the fixture scale
#      + the 120-statement DML statement fuzz sweep
#   5. plan audit       — regenerates PLANS.md (0 cartesian / 0 row-UDF)
#   6. bench            — one JSON line, best-of-2 per query
#
# Every run STAMPS its log with the tree it ran on (r11 verdict task
# 5: mid-round logs that predate the final tree must be identifiable
# — a gatelog whose stamp doesn't match HEAD at round close is stale
# and gets -superseded renamed or regenerated).
set -e
cd "$(dirname "$0")/.."
# r14 verdict #2: the round closed with a committed 0-byte
# BENCH_r14_pair.json. Any empty bench artifact is a failed run that
# must be regenerated or deleted, never committed — fail the gate.
EMPTY_BENCH=$(find tools/gatelogs -name 'BENCH_*' -size 0 2>/dev/null)
if [ -n "$EMPTY_BENCH" ]; then
  echo "GATE FAIL: empty bench artifact(s): $EMPTY_BENCH" >&2
  exit 1
fi
echo "=== GATE STAMP: HEAD=$(git rev-parse --short HEAD)\
 dirty=$(git status --porcelain | wc -l | tr -d ' ')\
 registry=$(python -c 'from quasar_destination_h2_spark.plans import REGISTRY; print(len(REGISTRY))')\
 date=$(date -u +%Y-%m-%dT%H:%M:%SZ) ==="
# r15 verdict task 6: NAME the dirty files at both markers so a
# stamp-to-end dirty-count delta is auditable mechanically (the
# expected mid-gate PLANS.md regeneration vs an untested edit)
git status --porcelain | sed 's/^/GATE DIRTY: /'
python -m pytest tests/ -q
python tools/oracle_check.py /root/testdata/sf0.01
python tools/oracle_check.py /root/testdata/sf0.1
SPARK_GRAFT_SF_DIR_TEST=/root/testdata/sf0.1 \
  python -m pytest tests/test_sql_differential_fuzz.py -q
SPARK_GRAFT_DML_FUZZ=120 python -m pytest tests/test_dml_statement_fuzz.py -q
SPARK_GRAFT_DDL_FUZZ=120 python -m pytest tests/test_ddl_statement_fuzz.py -q
python tools/plan_audit.py /root/testdata/sf0.1
python bench.py
echo "=== GATE END: HEAD=$(git rev-parse --short HEAD)\
 dirty=$(git status --porcelain | wc -l | tr -d ' ') ==="
git status --porcelain | sed 's/^/GATE DIRTY: /'
