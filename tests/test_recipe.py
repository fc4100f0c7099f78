"""End-to-end three-stage training recipe (reference README.md:46-68):
classify pretrain -> encoder transfer + freeze -> SBL tf 0.5 -> tf 0.1 ->
full finetune, asserting the eval WER improves stage over stage.

Settings mirror tools/three_stage_recipe.py's tiny mode, tuned so the
stage WERs land at [1.0, 0.75, 0.5] deterministically (fixed seeds) in
~5-6 min on this CPU:  2 words x 8 clips of the learnable pattern task,
12 frames, dropout off, eval on the train set (memorization protocol),
gentler finetune LR (see recipe.run_three_stage_recipe docstring).
"""
import dataclasses

import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.data import SyntheticPatternDataset
from sbl_for_multilingual_lip_reading_tpu.training.recipe import (
    run_three_stage_recipe)


@pytest.mark.slow
def test_three_stage_recipe_wer_improves(tmp_path):
    cfg_c = C.tiny_test("classify")
    cfg_c = dataclasses.replace(
        cfg_c, batch_size=8,
        data=dataclasses.replace(cfg_c.data, frames=12))
    cfg_s = C.tiny_test("sbl")
    cfg_s = dataclasses.replace(
        cfg_s, batch_size=8,
        data=dataclasses.replace(cfg_s.data, frames=12),
        dims=dataclasses.replace(cfg_s.dims, dropout=0.0),
        frontend=dataclasses.replace(cfg_s.frontend, dropout=0.0),
        optim=dataclasses.replace(cfg_s.optim, k=0.5, warmup_steps=20,
                                  label_smoothing=0.0))
    finetune_cfg = dataclasses.replace(
        cfg_s, optim=dataclasses.replace(cfg_s.optim, k=0.1))

    mk = dict(n_words=2, samples_per_word=8)
    ds_c = SyntheticPatternDataset(split="train", frames=cfg_c.data.frames,
                                   raw_size=cfg_c.data.raw_size, **mk)
    ds_s = SyntheticPatternDataset(split="train", frames=cfg_s.data.frames,
                                   raw_size=cfg_s.data.raw_size, **mk)

    records = run_three_stage_recipe(
        cfg_c, cfg_s, ds_c, ds_s, ds_s, str(tmp_path),
        classify_steps=2, stage_steps=2, epochs_per_stage=60,
        stage_epochs={"classify": 30, "stage2_tf01_frozen": 120},
        finetune_cfg=finetune_cfg)

    assert [r["stage"] for r in records] == [
        "classify", "stage2_tf05_frozen", "stage2_tf01_frozen",
        "stage3_finetune"]
    # the classify encoder actually transferred into every SBL stage
    assert all(r["transferred"] > 0 for r in records[1:])
    wers = [r["wer"] for r in records[1:]]
    # WER improves stage over stage: monotone non-increasing with strict
    # overall improvement (observed [1.0, 0.75, 0.5] at these seeds)
    assert all(b <= a + 1e-9 for a, b in zip(wers, wers[1:])), wers
    assert wers[-1] < wers[0], wers
    assert wers[-1] <= 0.75, wers
    # losses fall across the sbl stages too
    losses = [r["loss"] for r in records[1:]]
    assert losses[-1] < losses[0]
