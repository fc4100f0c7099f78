#!/usr/bin/env python
"""Training entry point (reference: SBL_Multilingual_Lip_reading/train.py).

Examples:
    python train.py --workload sbl --synthetic --epochs 1 \
        --max-steps-per-epoch 10 --max-eval-batches 2
    python train.py --workload classify --lrw-path /data/lrw_npy
    python train.py --workload sbl --transfer-from checkpoints/classify
"""
from sbl_for_multilingual_lip_reading_tpu.cli import run_train

if __name__ == "__main__":
    run_train()
