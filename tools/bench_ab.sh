#!/usr/bin/env bash
# Standing VM-drift control (the bench_r9_ab.log discipline, now a script):
# run graft.Bench on HEAD and on a recorded baseline commit in a detached
# worktree — SEQUENTIALLY, never concurrently (measurement isolation: this
# VM's baseline drifts 25-30% between sessions, so cross-session numbers
# must never be compared without a same-session control) — and print both
# totals plus the HEAD/REF ratio. A ratio near 1.0 on untouched queries
# means any absolute shift is environment drift, not code.
#
# Usage (closing gate):
#   tools/bench_ab.sh | tee tools/logs/bench_ab_r<N>.log
# The baseline commit is read from tools/logs/BENCH_BASELINE_REF (one hash,
# updated each round to that round's closing commit) or overridden with
# SPARK_GRAFT_AB_REF.
set -euo pipefail
cd "$(dirname "$0")/.."
REF="${SPARK_GRAFT_AB_REF:-$(cat tools/logs/BENCH_BASELINE_REF)}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-16}"
WT=target/ab_ref
echo "== graft bench A/B ($(date -u +%FT%TZ)) HEAD=$(git rev-parse --short HEAD) vs REF=$REF sf=$SF =="
bench_in() { # $1 = checkout dir, $2 = label; emits "<label> <json line>"
  # grep -o strips sbt's "[info] " stdout prefix — json.loads below gets
  # the bare object regardless of sbt's log decoration
  ( cd "$1" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
      sbt -batch "runMain graft.Bench" 2>/dev/null ) | grep -o '{"metric".*}' | tail -1 \
    | sed "s/^/$2 /"
}
git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --detach "$WT" "$REF" >/dev/null
trap 'git worktree remove --force "$WT" 2>/dev/null || true' EXIT
HEADLINE="$(bench_in . HEAD)"
REFLINE="$(bench_in "$WT" REF)"
echo "$HEADLINE"
echo "$REFLINE"
python3 - "$HEADLINE" "$REFLINE" <<'EOF'
import json, sys
h = json.loads(sys.argv[1].split(" ", 1)[1])
r = json.loads(sys.argv[2].split(" ", 1)[1])
# compare over the SHARED query set only: a round that widens the bench
# surface must not read as a total-time regression against the older REF
shared = [q for q in h["queries"] if r["queries"].get(q, 0) > 0]
hs = sum(h["queries"][q] for q in shared)
rs = sum(r["queries"][q] for q in shared)
print(f"ratio HEAD/REF shared-total: {hs/rs:.3f} ({hs:.2f}s vs {rs:.2f}s over {len(shared)} shared queries)")
per = {q: h["queries"][q] / r["queries"][q] for q in shared}
worst = sorted(per.items(), key=lambda kv: -kv[1])[:5]
print("worst per-query ratios:", ", ".join(f"{q}={v:.2f}" for q, v in worst))
new_only = sorted(q for q in h["queries"] if q not in per)
if new_only:
    print("HEAD-only queries (no REF baseline):",
          ", ".join(f"{q}={h['queries'][q]:.2f}s" for q in new_only))
EOF
