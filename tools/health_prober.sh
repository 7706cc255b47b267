#!/bin/bash
# Poll tools/host_health.py every INTERVAL seconds; on the FIRST healthy
# verdict, exec tools/healthy_regen.sh <tag> (the artifact-of-record
# regeneration, which re-gates itself at every step). Appends one JSON
# line per probe to the log so the round's window evidence is a file,
# not a shell scrollback. Formalizes the inline loop used in rounds
# 12–13 (PLANS.md round-13 window log: 109+ consecutive failed probes).
#
# Usage: tools/health_prober.sh <round-tag e.g. r14> [interval-sec=150] [log=HEALTH_PROBES_<tag>.jsonl]
set -uo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?usage: tools/health_prober.sh r14 [interval] [log]}"
INTERVAL="${2:-150}"
LOG="${3:-HEALTH_PROBES_${TAG}.jsonl}"
PYTHON="${PYTHON:-python3}"

echo "prober: tag=$TAG interval=${INTERVAL}s log=$LOG" >&2
while true; do
  verdict=$("$PYTHON" tools/host_health.py 2>/dev/null)
  healthy=$(printf '%s' "$verdict" | "$PYTHON" -c "import json,sys; print(json.load(sys.stdin).get('healthy'))" 2>/dev/null || echo parse-error)
  printf '{"ts":"%s","healthy":%s,"detail":%s}\n' \
    "$(date -u +%FT%TZ)" \
    "$([ "$healthy" = True ] && echo true || echo false)" \
    "$(printf '%s' "$verdict" | "$PYTHON" -c 'import json,sys; print(json.dumps(json.load(sys.stdin)))' 2>/dev/null || echo '{}')" >> "$LOG"
  if [ "$healthy" = True ]; then
    echo "prober: HEALTHY at $(date -u +%FT%TZ) — launching healthy_regen.sh $TAG" >&2
    exec bash tools/healthy_regen.sh "$TAG"
  fi
  sleep "$INTERVAL"
done
