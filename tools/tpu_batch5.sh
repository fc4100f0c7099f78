#!/bin/bash
# Round-5 item 5 combined A/B batch: attention-tile sweep + bf16 levers on
# the production donated B=240 train step (bracketed base / levers / base).
#
# Levers under test (all default OFF):
#   SBL_TRAIN_TILE=16/32  -- train-attention flat-kernel batch tile (fewer
#                            programs per dispatch; round-4 trace bills
#                            ~46 ms/iter to the attention customs)
#   GRAD_ACCUM_BF16=1     -- bf16 decoder dW accumulation (~34 ms of f32
#                            segment adds in the round-4 trace)
#   SBL_ATTN_BF16_OPS=1   -- bf16 attention dot operands / head folds
#
# Usage: bash tools/tpu_batch5.sh > /tmp/tpu_batch5.log 2>&1
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
run gabf16 GRAD_ACCUM_BF16=1
run attnbf16 SBL_ATTN_BF16_OPS=1
run combo GRAD_ACCUM_BF16=1 SBL_ATTN_BF16_OPS=1
run base2
echo "BATCH5 DONE"
