#!/bin/bash
# The full round close in ONE sequential command (r14 verdict #2: the
# round built the perf-verdict instrument and then ran out of clock
# before it wrote its artifacts — a 0-byte BENCH_r14_pair.json got
# committed and no BENCH_AB_r14_summary.json ever existed). Running
# the close through this script makes forgetting impossible: the
# script fails unless every artifact it is responsible for exists,
# is non-empty, and parses as JSON.
#
# Usage (tmux, ~100 min: gate >1h + pair ~15min + A/B ~25min):
#   bash tools/close_round.sh r15 [old-ref-for-AB]
# The A/B's old ref defaults to the latest `round N:` close commit —
# pass it explicitly when HEAD already contains driver commits from
# the round being closed.
# pipefail: the gate and oracle runs are piped through tee — without
# it their failures would vanish behind tee's exit 0 and a failed
# gate would still print CLOSE OK (review r15)
set -euo pipefail
TAG="${1:?usage: close_round.sh <tag e.g. r15> [old-ref]}"
OLD_REF="${2:-}"
cd "$(dirname "$0")/.."
mkdir -p tools/gatelogs

bash tools/check_all.sh 2>&1 | tee "tools/gatelogs/FINAL_${TAG}.log"
python tools/oracle_check.py /root/testdata/sf0.001 2>&1 \
  | tee "tools/gatelogs/ORACLE_SF0001_${TAG}.log"
# bench.py prints the FULL payload line then a compact tail line
# (r17 — driver-artifact truncation fix); the pair artifact needs the
# full line (pair series + spreads live only there)
SPARK_GRAFT_BENCH_PAIR=1 python bench.py \
  | grep '"common_set"' | tail -1 > "tools/gatelogs/BENCH_${TAG}_pair.json"
if [ -n "$OLD_REF" ]; then
  python tools/bench_ab.py --tag "$TAG" --runs 2 --old "$OLD_REF"
else
  python tools/bench_ab.py --tag "$TAG" --runs 2
fi

# the artifact assertion the r14 close was missing: non-empty, valid
# JSON, or the close FAILS here and the stall is visible immediately
for f in "tools/gatelogs/BENCH_${TAG}_pair.json" \
         "tools/gatelogs/BENCH_AB_${TAG}_summary.json"; do
  [ -s "$f" ] || { echo "CLOSE FAIL: missing/empty $f" >&2; exit 1; }
  python -c "import json,sys; json.load(open(sys.argv[1]))" "$f" \
    || { echo "CLOSE FAIL: unparseable $f" >&2; exit 1; }
done
echo "=== CLOSE OK: ${TAG} HEAD=$(git rev-parse --short HEAD) ==="
