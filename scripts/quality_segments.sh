#!/bin/bash
# Segmented driver for long quality runs: each segment resumes from the
# latest step_* checkpoint under the run dir and advances training.steps
# by SEG, then the process exits — bounding host RSS per segment (the
# device-transfer path grows host memory roughly with bytes uploaded on
# this backend, ~2 MB/step at PUNet bs=32; see BASELINE.md).
#
# Usage: scripts/quality_segments.sh RUN_DIR TARGET [SEG] [DEADLINE_UNIX]
set -u
cd "$(dirname "$0")/.."
RUN_DIR=${1:?run dir (e.g. runs/quality)}
TARGET=${2:?target step}
SEG=${3:-10000}
DEADLINE=${4:-0}
LOG=${QUALITY_SEG_LOG:-/tmp/quality_segments.log}

while true; do
  # Cooperative pause: `touch /tmp/qseg_pause` to keep the TPU lease free
  # between segments (e.g. for a quick kernel measurement); rm to resume.
  while [ -e /tmp/qseg_pause ]; do sleep 10; done
  last=$(ls -d "$RUN_DIR"/step_* 2>/dev/null | sed 's/.*step_//' | sort -n | tail -1)
  if [ -z "$last" ]; then echo "no checkpoint under $RUN_DIR" >&2; exit 1; fi
  if [ "$last" -ge "$TARGET" ]; then echo "done at step $last"; break; fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "deadline reached at step $last"; break
  fi
  next=$((last + SEG)); [ "$next" -gt "$TARGET" ] && next=$TARGET
  echo "=== segment $last -> $next ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  # train.py saves to <save_dir>/<cfg.name>; RUN_DIR is that full path
  # (e.g. runs/quality/PVDS_PUNet), so hand its parent to --save_dir
  python train.py --model_path "$RUN_DIR"/ --save_dir "$(dirname "$RUN_DIR")" \
    --training.steps "$next" >> "$LOG" 2>&1
  rc=$?
  echo "segment rc=$rc" | tee -a "$LOG"
  # On failure: wait out any lingering device lease, then resume from
  # the last good checkpoint (one retry per segment loop pass).
  [ "$rc" -ne 0 ] && sleep 120
done
