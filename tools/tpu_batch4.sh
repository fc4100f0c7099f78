#!/bin/bash
# Round-5 item 5 probe batch B: bf16 decoder-dW accumulation A/B.
#
# GRAD_ACCUM_BF16 hoists the params' f32->bf16 cast out of the decode scan
# (nn.map_variables), so the scan backward accumulates per-step parameter
# cotangents in bf16 -- targeting the ~34 ms/iter of f32 dW segment adds
# the round-4 trace bills to the decoder backward.  Bracketed same-session
# A/B on the production donated B=240 step: base / bf16 / base.
#
# Usage: bash tools/tpu_batch4.sh > /tmp/tpu_batch4.log 2>&1
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
run gabf16 GRAD_ACCUM_BF16=1
run attnbf16 SBL_ATTN_BF16_OPS=1
run combo GRAD_ACCUM_BF16=1 SBL_ATTN_BF16_OPS=1
run combo32 GRAD_ACCUM_BF16=1 SBL_ATTN_BF16_OPS=1 SBL_TRAIN_TILE=32
run base2
echo "BATCH4 DONE"
