#!/bin/bash
# One serialized TPU measurement session (one process at a time — the
# axon tunnel serializes leases): per-shape conv A/B, then whole-forward
# A/B of the layout/fusion candidates. Results append to $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/ab_r3.log}

run() {  # run NAME ENVVARS... -- CMD...
  local name=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $name ($(date -u +%H:%M:%S)) env: ${envs[*]:-none}" | tee -a "$LOG"
  timeout 900 env "${envs[@]}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- rc=$rc ($(date -u +%H:%M:%S))" | tee -a "$LOG"
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 143 ]; then
    # a killed TPU client blocks the next lease for minutes (CLAUDE.md);
    # wait until a probe succeeds before the next measurement so one bad
    # run doesn't cascade through the whole session
    echo "--- killed client: probing until the backend is back" | tee -a "$LOG"
    bash "$(dirname "$0")/tpu_probe_loop.sh" "$LOG.probe"
  fi
}

# Order: known-good baseline first; the Pallas-conv runs LAST — the
# previous session's TPU-worker death coincided with a conv A/B, so the
# riskiest programs go after every measurement that doesn't need them.
run fwd_baseline -- \
  python scripts/profile_forward.py fwd --out /tmp/op_base.json
run fwd_interp P2PB_INTERP_FUSED=1 -- \
  python scripts/profile_forward.py fwd --out /tmp/op_interp.json
run fwd_devox_fold P2PB_DEVOX_FOLD=inside -- \
  python scripts/profile_forward.py fwd --out /tmp/op_devoxf.json
run fwd_bqg_rows P2PB_BQG_ROWS=1 -- \
  python scripts/profile_forward.py fwd --out /tmp/op_rows.json
run fwd_pallas_conv P2PB_CONV3D=pallas P2PB_GN_FUSE=1 P2PB_CONV3D_FOLD=inside -- \
  python scripts/profile_forward.py fwd --out /tmp/op_pconv.json
run fwd_pallas_conv_nogn P2PB_CONV3D=pallas P2PB_GN_FUSE=0 P2PB_CONV3D_FOLD=inside -- \
  python scripts/profile_forward.py fwd --out /tmp/op_pconv_nogn.json
run fwd_combo P2PB_CONV3D=pallas P2PB_GN_FUSE=1 P2PB_CONV3D_FOLD=inside P2PB_BQG_ROWS=1 P2PB_INTERP_FUSED=1 P2PB_DEVOX_FOLD=inside -- \
  python scripts/profile_forward.py fwd --out /tmp/op_combo.json
run conv_shapes -- python scripts/bench_conv3d.py

run room_baseline -- \
  python scripts/profile_forward.py fwd --config PVDL_SNPP --out /tmp/op_room_base.json
run room_combo P2PB_CONV3D=pallas P2PB_GN_FUSE=1 P2PB_CONV3D_FOLD=inside P2PB_BQG_ROWS=1 P2PB_INTERP_FUSED=1 P2PB_DEVOX_FOLD=inside -- \
  python scripts/profile_forward.py fwd --config PVDL_SNPP --out /tmp/op_room_combo.json

echo "=== DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
