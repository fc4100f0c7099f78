"""The reference's staged training recipe as one scripted pipeline.

Reference README.md:46-68 describes the accelerated three-stage protocol:

* Stage 1: pretrain the visual frontend + encoder with the 1500-class
  word classification task (VSR_visual_frontend_pretraining_..._classify).
* Stage 2: transfer that encoder into the SBL model, FREEZE it
  (``p.requires_grad = False``), and train the decoder -- first with
  teacher forcing 0.5, then annealed to 0.1.
* Stage 3: unfreeze everything and finetune at teacher forcing 0.5.

The reference runs these as four manual ``train.py`` invocations with
``vim utils.py`` edits in between; here each stage is a fresh ``Trainer``
whose weights flow through the same checkpoint-transfer path the CLI uses
(``--transfer-from`` / ``restore_for_transfer``), so the pipeline is the
scripted equivalent of the by-hand recipe.  Each stage starts a fresh
optimizer/schedule, matching the reference's per-run Noam restart.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

from .trainer import Trainer
from . import checkpoint as ckpt


def _stage_cfg(sbl_cfg, teacher_forcing: float, freeze: tuple):
    return dataclasses.replace(
        sbl_cfg,
        decoder=dataclasses.replace(sbl_cfg.decoder,
                                    teacher_forcing_rate=teacher_forcing),
        freeze_prefixes=freeze)


def run_three_stage_recipe(classify_cfg, sbl_cfg, classify_ds, sbl_ds,
                           eval_ds, workdir: str,
                           classify_steps: int = 50,
                           stage_steps: int = 100,
                           epochs_per_stage: int = 1,
                           max_eval_batches: Optional[int] = None,
                           stage_epochs: Optional[Dict[str, int]] = None,
                           finetune_cfg=None,
                           logger=None) -> List[Dict]:
    """Run classify -> transfer -> sbl(tf .5, frozen) -> sbl(tf .1, frozen)
    -> sbl finetune(tf .5).  Returns one record per stage with the greedy
    eval WER after it (``l2r_wer + r2l_wer`` halved), most-recent last.

    steps are per-epoch caps (``max_steps_per_epoch``); datasets follow the
    Trainer contract.  Checkpoints land under ``workdir/stage*``.
    stage_epochs: optional per-stage epoch override keyed by stage name.
    finetune_cfg: optional config for stage 3 (the reference restarts the
    same Noam schedule per run; at tiny/CPU walkthrough scale that restart
    is violent enough to wreck a memorized solution, so callers may pass a
    gentler-LR config for the finetune stage).
    """
    records: List[Dict] = []

    def log(msg):
        if logger is not None:
            logger.info(msg)

    def n_epochs(name):
        return (stage_epochs or {}).get(name, epochs_per_stage)

    # ---- stage 1: classify pretrain (frontend + encoder) ----------------
    tr_c = Trainer(classify_cfg, classify_ds)
    for e in range(n_epochs("classify")):
        loss = tr_c.train_epoch(e, max_steps=classify_steps)
    p1 = os.path.join(workdir, "stage1_classify")
    ckpt.save_checkpoint(p1, tr_c.state)
    records.append({"stage": "classify", "loss": loss})
    log(f"stage 1 (classify) done: loss {loss:.3f}")

    def sbl_stage(name, prev_path, teacher_forcing, freeze, steps,
                  base_cfg=None):
        cfg = _stage_cfg(base_cfg or sbl_cfg, teacher_forcing, freeze)
        tr = Trainer(cfg, sbl_ds)
        tr.state, loaded = ckpt.restore_for_transfer(prev_path, tr.state)
        for e in range(n_epochs(name)):
            loss = tr.train_epoch(e, max_steps=steps)
        out = tr.validate_seq2seq(eval_ds, max_batches=max_eval_batches)
        path = os.path.join(workdir, name)
        ckpt.save_checkpoint(path, tr.state)
        wer = 0.5 * (out["l2r_wer"] + out["r2l_wer"])
        records.append({"stage": name, "loss": loss, "wer": wer,
                        "metrics": out, "transferred": len(loaded),
                        "path": path})
        log(f"{name}: loss {loss:.3f} wer {wer:.3f} "
            f"({len(loaded)} params transferred)")
        return path

    # ---- stage 2: frozen encoder, decoder learns (tf 0.5 -> 0.1) --------
    frozen = ("frontend", "encoder")
    p2a = sbl_stage("stage2_tf05_frozen", p1, 0.5, frozen, stage_steps)
    p2b = sbl_stage("stage2_tf01_frozen", p2a, 0.1, frozen, stage_steps)
    # ---- stage 3: full finetune (tf 0.5, requires_grad True) ------------
    sbl_stage("stage3_finetune", p2b, 0.5, (), stage_steps,
              base_cfg=finetune_cfg)
    return records
