"""Scripted walkthrough of the reference's staged training recipe
(README.md:46-68) on the learnable synthetic task.

Runs classify pretrain -> encoder transfer+freeze -> SBL tf 0.5 -> tf 0.1
-> full finetune via training/recipe.py and prints the per-stage eval WER.

Usage:
    python tools/three_stage_recipe.py --cpu                 # tiny dims
    python tools/three_stage_recipe.py --full-dims           # on the chip
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--full-dims", action="store_true")
    ap.add_argument("--n-words", type=int, default=None)
    ap.add_argument("--samples-per-word", type=int, default=None)
    ap.add_argument("--classify-steps", type=int, default=None)
    ap.add_argument("--stage-steps", type=int, default=None)
    ap.add_argument("--epochs-per-stage", type=int, default=1)
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--eval-train", action="store_true",
                    help="evaluate on the train set (memorization protocol)")
    ap.add_argument("--dropout0", action="store_true",
                    help="disable dropout (tiny-dims memorization)")
    ap.add_argument("--frames", type=int, default=None,
                    help="override clip length (shorter = faster CPU steps)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import (
        SyntheticPatternDataset)
    from sbl_for_multilingual_lip_reading_tpu.training.recipe import (
        run_three_stage_recipe)
    from sbl_for_multilingual_lip_reading_tpu.utils.logging import get_logger

    if args.full_dims:
        cfg_c, cfg_s = C.classify(), C.sbl()
        n_words = args.n_words or 100
        spw = args.samples_per_word or 20
        classify_steps = args.classify_steps or 200
        stage_steps = args.stage_steps or 200
    else:
        cfg_c, cfg_s = C.tiny_test("classify"), C.tiny_test("sbl")
        cfg_c = dataclasses.replace(cfg_c, batch_size=8)
        cfg_s = dataclasses.replace(
            cfg_s, batch_size=8,
            optim=dataclasses.replace(cfg_s.optim, k=0.5, warmup_steps=20,
                                      label_smoothing=0.0))
        if args.dropout0:
            cfg_s = dataclasses.replace(
                cfg_s,
                dims=dataclasses.replace(cfg_s.dims, dropout=0.0),
                frontend=dataclasses.replace(cfg_s.frontend, dropout=0.0))
        n_words = args.n_words or 4
        spw = args.samples_per_word or 8
        classify_steps = args.classify_steps or 40
        stage_steps = args.stage_steps or 80

    if args.frames:
        cfg_c = dataclasses.replace(cfg_c, data=dataclasses.replace(
            cfg_c.data, frames=args.frames))
        cfg_s = dataclasses.replace(cfg_s, data=dataclasses.replace(
            cfg_s.data, frames=args.frames))
    mk_c = dict(n_words=n_words, samples_per_word=spw,
                frames=cfg_c.data.frames, raw_size=cfg_c.data.raw_size)
    mk_s = dict(n_words=n_words, samples_per_word=spw,
                frames=cfg_s.data.frames, raw_size=cfg_s.data.raw_size)
    ds_c = SyntheticPatternDataset(split="train", **mk_c)
    ds_s = SyntheticPatternDataset(split="train", **mk_s)
    held = ds_s if args.eval_train else SyntheticPatternDataset(
        split="heldout", **{**mk_s, "samples_per_word": 4})

    workdir = args.workdir or tempfile.mkdtemp(prefix="recipe_")
    finetune_cfg = None
    stage_epochs = None
    if not args.full_dims:
        # gentler finetune restart + longer tf-0.1 stage: see
        # recipe.run_three_stage_recipe docstring
        finetune_cfg = dataclasses.replace(
            cfg_s, optim=dataclasses.replace(cfg_s.optim, k=0.1))
        e = args.epochs_per_stage
        stage_epochs = {"classify": e // 2, "stage2_tf01_frozen": 2 * e}
    t0 = time.time()
    records = run_three_stage_recipe(
        cfg_c, cfg_s, ds_c, ds_s, held, workdir,
        classify_steps=classify_steps, stage_steps=stage_steps,
        epochs_per_stage=args.epochs_per_stage, stage_epochs=stage_epochs,
        finetune_cfg=finetune_cfg, logger=get_logger())
    print(f"\n=== recipe done in {time.time() - t0:.0f}s ===")
    for r in records:
        wer = f"  wer {r['wer']:.3f}" if "wer" in r else ""
        print(f"{r['stage']}: loss {r['loss']:.3f}{wer}")
    wers = [r["wer"] for r in records if "wer" in r]
    print("stage WERs:", [round(w, 3) for w in wers])
    return 0 if wers[-1] <= wers[0] else 1


if __name__ == "__main__":
    sys.exit(main())
