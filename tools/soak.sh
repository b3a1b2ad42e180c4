#!/usr/bin/env bash
# Standing round-close SCALE GATE (round-11, VERDICT r10 "Next round"
# #6): the full-surface sf1 soak found four real latent-O(SF²) shapes
# in round 10 (r16 IVF cells, r48/r51 fold-in panels, d23 blocking),
# so it runs EVERY round, scripted, not as a one-off heroic.
#
#   tools/soak.sh [srcSfDir] [soakDir] [copies] [baseBenchJson]
#
# 1. graft.ScaleGen rebuilds the salted soak corpus (content-salted
#    docs, per-copy p_name salt, "cKx" copy prefix — the separator must
#    stay inside TextNorm's [\p{L}\p{N}] token class; see ScaleGen).
# 2. graft.Bench runs the FULL key surface on it; the per-key detail
#    lands in BENCH_SOAK_SF<copies/10>.json (the committed sf0.1
#    BENCH_FULL.json is preserved around the run — Bench writes to the
#    repo root).
# 3. tools/scale_ratio.py compares against the committed sf0.1 run and
#    EXITS NONZERO if any key went missing at the soak SF or errored —
#    no silent caps. Superlinear keys PRINT for manual attribution but
#    do not fail the gate (full-bench context inflates marginal lines;
#    the procedure is to re-measure flagged keys isolated via BenchOne
#    before calling them regressions — BASELINE.md §3c/§4).
#
# Expected wall time at copies=10 on local[16]: ~25–35 min (dominated
# by the bench's 2×354 query runs). Run it alone: any concurrent
# Spark/sbt job on the host inflates the slow lines.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/sf1}"
COPIES="${3:-10}"
BASE="${4:-BENCH_FULL.json}"
CPUS="${SPARK_GRAFT_CPUS:-16}"
MEM="${SPARK_DRIVER_MEM:-48g}"
SOAK_JSON="BENCH_SOAK_$(basename "$OUT").json"

[ -f "$BASE" ] || { echo "soak: base bench $BASE missing" >&2; exit 1; }

echo "== soak 1/3: ScaleGen $SRC -> $OUT (x$COPIES)"
SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.ScaleGen $SRC $OUT $COPIES"

echo "== soak 2/3: full Bench on $OUT (local[$CPUS], $MEM heap)"
# Snapshot the file Bench ACTUALLY writes (BENCH_FULL.json), not $BASE:
# when the optional 4th arg names a different base file, comparing the
# post-run BENCH_FULL.json against a $BASE snapshot would compare two
# unrelated files — a bench that crashed before writing would silently
# promote the stale pre-run BENCH_FULL.json into $SOAK_JSON, the exact
# false comparison this guard exists to stop.
KEEP="$(mktemp)"
if [ -f BENCH_FULL.json ]; then cp BENCH_FULL.json "$KEEP"; else : > "$KEEP"; fi
# No `|| true` here: under pipefail a Bench crash OR a missing metric
# line fails the script. Otherwise the mv below would promote the
# UNTOUCHED baseline into $SOAK_JSON and scale_ratio would compare the
# base against a copy of itself — a silent false PASS.
SPARK_GRAFT_SF_DIR="$OUT" SPARK_GRAFT_CPUS="$CPUS" SPARK_DRIVER_MEM="$MEM" \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '{"metric"'
# belt-and-braces: the bench must have REWRITTEN the detail file
if cmp -s BENCH_FULL.json "$KEEP"; then
  echo "soak: BENCH_FULL.json unchanged after the run — bench never wrote" >&2
  rm -f "$KEEP"; exit 1
fi
mv BENCH_FULL.json "$SOAK_JSON"
# restore the committed per-key detail file the run clobbered (skip
# the restore when there was nothing to clobber)
[ -s "$KEEP" ] && cp "$KEEP" BENCH_FULL.json; rm -f "$KEEP"

echo "== soak 3/3: scale_ratio $BASE vs $SOAK_JSON"
python3 tools/scale_ratio.py "$BASE" "$SOAK_JSON"
echo "soak: PASS — slopes above in $SOAK_JSON; update BASELINE.md §3"
