#!/bin/bash
# Probe the axon TPU backend until it comes back, then exit 0.
# Gentle cadence: a killed client blocks the next lease for minutes,
# so each attempt gets a long timeout and attempts are well spaced.
LOG=${1:-/tmp/tpu_probe.log}
ATTEMPT_TIMEOUT=${2:-900}
QUIET=${3:-720}
while true; do
  echo "=== probe $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout "$ATTEMPT_TIMEOUT" python - >> "$LOG" 2>&1 <<'EOF'
import time, numpy as np
t0 = time.time()
import jax, jax.numpy as jnp
print("devices:", jax.devices(), f"{time.time()-t0:.1f}s", flush=True)
y = np.asarray(jax.jit(lambda a: a @ a)(jnp.ones((128, 128))))
print("matmul ok", float(y[0, 0]), f"{time.time()-t0:.1f}s", flush=True)
EOF
  rc=$?
  echo "probe rc=$rc" >> "$LOG"
  if [ "$rc" -eq 0 ]; then echo "TPU BACK at $(date -u +%H:%M:%S)" >> "$LOG"; exit 0; fi
  sleep "$QUIET"
done
