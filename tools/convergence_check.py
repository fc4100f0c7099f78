"""End-to-end trainability checks on synthetic data.

Default mode -- memorize a tiny synthetic set: trains the tiny SBL config
(dropout off, tf-rate 0.1, no label smoothing) on 8 synthetic clips until
greedy bidirectional decode reproduces every target exactly (WER = PER = 0
in both directions).  On a TPU v5e this converges in ~400 steps / ~2
minutes; it also demonstrates the exposure-bias dynamics the reference's
staged teacher-forcing schedule (0.5 -> 0.1, README.md:62-68) exists to
address: with tf-rate 0.5 the loss memorizes but free-running decode stays
wrong; at 0.1 the free-running decode converges to zero error.

--full-dims -- convergence demonstration at REFERENCE dims: trains the full
SBL model (d_model 512, 6+6 layers) on a non-degenerate LEARNABLE synthetic
task (SyntheticPatternDataset: n distinct words whose pixels encode the
word) with the reference schedule (k=0.2, warmup 4000, label smoothing 0.1,
teacher forcing 0.5 staged down to 0.1), evaluating greedy WER on HELD-OUT
clips.  Near-zero held-out WER confirms the full-dims optimization dynamics
are healthy (the round-1 all-eos plateau was a degenerate-task artifact).

Usage: python tools/convergence_check.py [--steps 800]
       python tools/convergence_check.py --full-dims [--epochs 400]
Exits non-zero if the target is not reached within the budget.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_full_dims(args) -> int:
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import (
        SyntheticPatternDataset)
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer

    cfg = C.sbl()  # reference dims + schedule (k=0.2, warmup 4000, ls 0.1)
    # remat_frontend: the cached device-resident dataset shares HBM with
    # the activations, so keep the memory-saving setting here (the global
    # default flipped to False in round 3 for the plain host-fed path)
    cfg = dataclasses.replace(cfg, batch_size=args.batch_size,
                              remat_frontend=True)
    mk = dict(n_words=args.n_words, samples_per_word=args.samples_per_word,
              frames=cfg.data.frames, raw_size=cfg.data.raw_size)
    train_ds = SyntheticPatternDataset(split="train", **mk)
    held = SyntheticPatternDataset(split="heldout", **{**mk,
                                                       "samples_per_word": 4})

    def make_trainer(tf_rate):
        c = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder,
                                             teacher_forcing_rate=tf_rate))
        return Trainer(c, train_ds, {"heldout": held}, cache_on_device=True)

    tr = make_trainer(0.5)
    t0 = time.time()
    staged = False
    for epoch in range(args.epochs):
        if not staged and epoch >= args.stage2_epoch:
            # stage 2: anneal teacher forcing 0.5 -> 0.1 (README.md:62-68)
            state, rng = tr.state, tr.rng
            cache = (tr._dev_clips, tr._host_small)
            tr = make_trainer(0.1)
            tr.state, tr.rng = state, rng
            tr._dev_clips, tr._host_small = cache
            staged = True
            print(f"epoch {epoch}: teacher forcing -> 0.1", flush=True)
        loss = tr.train_epoch(epoch)
        if epoch % args.eval_every == args.eval_every - 1:
            out = tr.validate_seq2seq(held)
            print(f"epoch {epoch} step {int(tr.state.step)} "
                  f"loss {loss:.3f} heldout {out} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if out["l2r_wer"] <= args.target_wer \
                    and out["r2l_wer"] <= args.target_wer:
                print(f"CONVERGED: held-out WER <= {args.target_wer} at "
                      f"step {int(tr.state.step)}")
                return 0
    print("NOT converged within budget")
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full-dims", action="store_true")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch-size", type=int, default=240)
    ap.add_argument("--n-words", type=int, default=200)
    ap.add_argument("--samples-per-word", type=int, default=25)
    ap.add_argument("--stage2-epoch", type=int, default=220,
                    help="epoch at which teacher forcing anneals to 0.1")
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--target-wer", type=float, default=0.02)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.full_dims:
        return run_full_dims(args)

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
