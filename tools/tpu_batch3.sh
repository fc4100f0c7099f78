#!/bin/bash
# Round-5 item 5 probe batch: train-attention tile sweep on the prod step.
#
# The decoder issues 16 steps x 6 layers x 2 attention customs per train
# step (fwd + remat-fwd + bwd each); at _TRAIN_TILE=8 that is grid=30..60
# programs per dispatch, so per-program overhead is a candidate for the
# ~46 ms/iter the round-4 trace bills to attention customs.  Bracketed
# same-session A/B: base / tile16 / tile32 / base.
#
# Usage: bash tools/tpu_batch3.sh > /tmp/tpu_batch3.log 2>&1
set -u
cd /root/repo

run() {
  local name="$1"; shift
  echo "=== JOB $name start $(date -u +%H:%M:%S) ==="
  timeout 2400 env DONATE=1 JOBS=prod ITERS=4 REPS=3 "$@" \
    python tools/train_split_probe.py 2>&1 | grep -v -i warning | tail -4
  echo "=== END $name rc=$? $(date -u +%H:%M:%S) ==="
}

run base1
run tile16 SBL_TRAIN_TILE=16
run tile32 SBL_TRAIN_TILE=32
run base2
echo "BATCH DONE"
