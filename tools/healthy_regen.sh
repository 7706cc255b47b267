#!/bin/bash
# One-shot artifact-of-record regeneration for a HEALTHY host window
# (VERDICT r12 next-round #1). Ordered so the shortest, highest-value
# timing measurements land first — if the window collapses mid-run, the
# early artifacts still stand (each sweep re-checks the gate at start
# and embeds health_at_start + calibration_at_end). Run SOLO — no
# concurrent pytest/Spark (BENCH_variance_r9.json: up to 6.2x per-query
# noise from background load).
#
# The sf0.01 full-oracle correctness sweep is NOT here: it is not
# timing-sensitive — run it any time (tools/verify_local.py
# /root/testdata/sf0.01).
#
# Usage: tools/healthy_regen.sh <round-tag, e.g. r13>
# After it succeeds: update tests/test_scaling_artifacts.py filenames and
# the PLANS.md decade headline, then run tools/scale_compare.py and
# tools/bench_compare.py (printed at the end).
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?usage: tools/healthy_regen.sh r13}"
export SPARK_GRAFT_REQUIRE_HEALTHY=1
# One interpreter name for every invocation (ADVICE r13: a python/python3
# mix dies on hosts that ship only one of the two names).
PYTHON="${PYTHON:-python3}"

echo "== gate probe =="
"$PYTHON" tools/host_health.py | "$PYTHON" -c "import json,sys; d=json.load(sys.stdin); print('healthy:', d['healthy'], d['failures']); raise SystemExit(0 if d['healthy'] else 1)"

echo "== 1/4 graph_link_prediction sf1 solo (VERDICT r12 #2 — ~1 min; closes the monotone-series question even if the window collapses) =="
test -d .fixtures/sf1 || "$PYTHON" tools/gen_fixtures.py 1 .fixtures/sf1
SPARK_GRAFT_DRIVER_MEM=48g "$PYTHON" tools/verify_local.py .fixtures/sf1 \
    graph_link_prediction --no-oracle \
    --timings-out "REMEASURE_${TAG}_linkpred_sf1.json" 2>&1 | tail -2

echo "== 2/4 sf0.1 timing sweep (oracles) =="
"$PYTHON" tools/verify_local.py /root/testdata/sf0.1 \
    --timings-out "VERIFY_${TAG}_timings_sf01.json" 2>&1 | tail -3

echo "== 3/4 sf1 timing sweep (timing-only by convention; hashes pinned r7) =="
SPARK_GRAFT_DRIVER_MEM=48g "$PYTHON" tools/verify_local.py .fixtures/sf1 \
    --timings-out "VERIFY_${TAG}_timings_sf1.json" --no-oracle 2>&1 | tail -3

echo "== 4/4 solo bench =="
"$PYTHON" bench.py | tee "BENCH_${TAG}_solo.json"

echo "== next steps (manual) =="
echo "  * pin: tests/test_scaling_artifacts.py -> VERIFY_${TAG}_timings_sf{01,1}.json"
echo "  * headline: python tools/scale_compare.py VERIFY_${TAG}_timings_sf01.json VERIFY_${TAG}_timings_sf1.json  -> PLANS.md"
echo "  * compare: python tools/bench_compare.py"
echo "  * retire SUPPLEMENT_r12_sf1.json + r11 sf1 record per PLANS.md"
echo "  * run the sf0.01 full-oracle correctness sweep if not already done this round"
