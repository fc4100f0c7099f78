"""End-to-end trainability check: memorize a tiny synthetic set.

Trains the tiny SBL config (dropout off, tf-rate 0.1, no label smoothing) on
8 synthetic clips until greedy bidirectional decode reproduces every target
exactly (WER = PER = 0 in both directions).  On a TPU v5e this converges in
~400 steps / ~2 minutes; it also demonstrates the exposure-bias dynamics the
reference's staged teacher-forcing schedule (0.5 -> 0.1, README.md:62-68)
exists to address: with tf-rate 0.5 the loss memorizes but free-running
decode stays wrong; at 0.1 the free-running decode converges to zero error.

Usage: python tools/convergence_check.py [--steps 800]
Exits non-zero if the set is not memorized within the budget.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer

    cfg = C.tiny_test("sbl")
    cfg = dataclasses.replace(
        cfg, batch_size=8,
        dims=dataclasses.replace(cfg.dims, dropout=0.0),
        frontend=dataclasses.replace(cfg.frontend, dropout=0.0),
        decoder=dataclasses.replace(cfg.decoder, teacher_forcing_rate=0.1),
        optim=dataclasses.replace(cfg.optim, k=0.5, warmup_steps=100,
                                  label_smoothing=0.0))
    ds = SyntheticLipDataset(size=8, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds)
    t0 = time.time()
    for epoch in range(args.steps):
        loss = tr.train_epoch(epoch, max_steps=1)
        if epoch % 50 == 49:
            out = tr.validate_seq2seq(ds, max_batches=1)
            print(f"step {int(tr.state.step)} loss {loss:.3f} {out} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if out["l2r_wer"] == 0.0 and out["r2l_wer"] == 0.0:
                print("MEMORIZED")
                return 0
    print("NOT memorized within budget")
    return 1


if __name__ == "__main__":
    sys.exit(main())
