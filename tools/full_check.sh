#!/usr/bin/env bash
# Full differential verification sweep: run graft.Verify at the given SF dir,
# then tools/check.py (DuckDB oracle compare) — exit nonzero on any bad query.
#
# The sf0.1 run is the builder's own rule: two decimal-cast divergences were
# invisible at sf0.01 and bit 5 queries at sf0.1 in round 3. Run this after
# any oracle-SQL or arithmetic change:
#
#   tools/full_check.sh /root/testdata/sf0.1 | tee tools/logs/check_sf0.1.log
set -euo pipefail
SF_DIR="${1:?usage: full_check.sh <sf-dir> [out-dir]}"
OUT="${2:-target/verify_full}"
cd "$(dirname "$0")/.."
rm -rf "$OUT"
echo "== graft full check: $SF_DIR -> $OUT ($(date -u +%FT%TZ)) =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT" 2>&1 | grep -E "wrote|error|Exception" || true
python3 tools/check.py "$SF_DIR" "$OUT"
