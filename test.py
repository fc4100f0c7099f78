#!/usr/bin/env python
"""Evaluation entry point (reference: SBL_Multilingual_Lip_reading/test.py).

Loads a checkpoint and reports per-direction WER/PER on LRW and LRW-1000
(or their synthetic stand-ins with --synthetic).
"""
from sbl_for_multilingual_lip_reading_tpu.cli import run_test

if __name__ == "__main__":
    run_test()
