#!/bin/bash
# Pre-warm the CPU persistent compilation cache for the driver's
# multi-chip dryrun (see __graft_entry__.dryrun_multichip). The flagship
# fwd+bwd+opt train step costs ~2.5-5 min of XLA:CPU compile on this
# 1-core host; with a warmed cache the compile is a ~seconds cache hit
# and the dryrun total is dominated by executing one step on 8
# time-sliced virtual devices. Measured at the default N=512: cold 6m23
# (writes the cache), warm 4m49 under heavy contention / ~2 min idle
# (RUNBOOK_r4.md). Run this after ANY change to the model/train-step
# code and before ending a session (the cache dir .cache/jax_cpu is
# untracked and does not survive round snapshots).
#
# Usage: scripts/warm_dryrun_cache.sh [n_devices]
set -eu
cd "$(dirname "$0")/.."
N=${1:-8}
echo "=== warming unconditioned flagship dryrun (n=$N) ==="
time python -c "import __graft_entry__; __graft_entry__.dryrun_multichip($N)"
echo "=== warming conditioned flagship dryrun (n=$N) ==="
time python -c "import __graft_entry__; __graft_entry__.dryrun_multichip($N, conditioned=True)"
echo "cache entries:"; ls -la .cache/jax_cpu | head -20
