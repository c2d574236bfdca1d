#!/usr/bin/env bash
# Scale-exponent gate: run graft.ScaleBench on k-derived corpora and FAIL
# (exit nonzero) when any operator's top-span scaling exponent alpha_top
# exceeds SPARK_GRAFT_SCALE_MAX_ALPHA (default 1.3 — a linear op measures
# alpha <= ~1; a quadratic regression reads ~2). Part of the closing-commit
# discipline alongside full_check.sh:
#
#   tools/scale_gate.sh | tee tools/logs/scale_probe_r8.log
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== graft scale gate ($(date -u +%FT%TZ)) =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
SPARK_GRAFT_SCALE_KS="${SPARK_GRAFT_SCALE_KS:-1,4,16,64}" \
SPARK_GRAFT_SCALE_RUNS="${SPARK_GRAFT_SCALE_RUNS:-3}" \
  sbt -batch "runMain graft.ScaleBench"

# As-of skew gate (round-8 verdict task 8): the merge exec must stay flat
# on the dense-hot regime — the one where the binned form degrades to
# 15-109 s (tools/logs/asof_skew_r8.log). Only merge + salted run here;
# binned's pathology is the documented counterexample, not a gate subject.
echo "== as-of skew gate (dense:90, merge+salted <= ${SPARK_GRAFT_ASOF_GATE_SEC:-2.0} s) =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
SPARK_GRAFT_SKEW_CASES="dense:90" \
SPARK_GRAFT_SKEW_VARIANTS="merge,salted" \
SPARK_GRAFT_ASOF_GATE_SEC="${SPARK_GRAFT_ASOF_GATE_SEC:-2.0}" \
  sbt -batch "runMain graft.tools.AsOfSkewBench"
