#!/bin/bash
# Wait for the TPU probe loop (by pid) to exit successfully, then run
# the round-3 A/B session automatically (runbook step 2). Writes
# /tmp/ab_done when the session finishes so the operator can pick up
# at "flip winners" (runbook step 3).
set -u
cd "$(dirname "$0")/.."
PROBE_PID=${1:?probe pid}
LOG=${2:-/tmp/ab_r3.log}

while kill -0 "$PROBE_PID" 2>/dev/null; do sleep 20; done
if ! grep -q "TPU BACK" /tmp/tpu_probe.log; then
  echo "probe exited without recovery" > /tmp/ab_done
  exit 1
fi
echo "TPU back at $(date -u +%H:%M:%S); starting A/B session" | tee -a "$LOG"
bash scripts/tpu_ab_session.sh "$LOG"
touch /tmp/ab_done
