"""Numerical parity harness: this framework vs the reference PyTorch model.

Builds the reference SBL model (from /root/reference, torch CPU), copies its
weights into our JAX model via utils/torch_import.py, runs both on identical
inputs and reports max-abs differences for:

  * visual frontend features
  * encoder outputs
  * greedy bidirectional recognize (token sequences + per-step agreement)
    with ``fusion_mode='reference_aliased'`` -- this empirically validates
    the closed-form aliased-fusion derivation in models/decoder_sbl.py
    against the reference's actual in-place loops.

The reference's always-on functional dropout in the frontend
(video_frontend.py:122 ``F.dropout(x, p=0.5)`` -- active even in eval) is
patched to identity for the comparison; everything else runs the reference
code untouched.

Usage:  python tools/parity_check.py [--reference /root/reference] [--batch 2]
Exits non-zero if token sequences disagree.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_reference_model(ref_sbl_dir: str):
    import torch
    import torch.nn.functional as F
    sys.path.insert(0, ref_sbl_dir)
    cwd = os.getcwd()
    os.chdir(ref_sbl_dir)
    try:
        from transformer.encoder import Encoder as TEncoder
        from transformer.decoder import Decoder as TDecoder
        from transformer.transformer import Transformer as TTransformer
    finally:
        os.chdir(cwd)
    # neutralize the always-on functional dropout (frontend eval bug)
    F.dropout = lambda x, p=0.5, training=True, inplace=False: x
    torch.manual_seed(7)
    encoder = TEncoder(512, 6, 8, 64, 64, 512, 2048, dropout=0.1,
                       pe_maxlen=5000)
    decoder = TDecoder(0, 1, 58, 512, 6, 8, 64, 64, 512, 2048, dropout=0.1,
                       tgt_emb_prj_weight_sharing=1, pe_maxlen=5000)
    model = TTransformer(encoder, decoder, None)
    model.eval()
    return model


def run(reference_root: str, batch: int = 2, seed: int = 0,
        verbose: bool = True) -> dict:
    import torch
    import jax
    import jax.numpy as jnp
    import dataclasses
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.utils.torch_import import (
        import_sbl_model)

    ref_dir = os.path.join(reference_root, "SBL_Multilingual_Lip_reading")
    tmodel = build_reference_model(ref_dir)
    sd = {k: v.detach().cpu().numpy()
          for k, v in tmodel.state_dict().items()}

    cfg = C.sbl()
    cfg = dataclasses.replace(
        cfg, compute_dtype="float32",
        decoder=dataclasses.replace(cfg.decoder,
                                    fusion_mode="reference_aliased"))
    model = build_model(cfg)
    params, batch_stats = import_sbl_model(sd)
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.RandomState(seed)
    video = rng.randn(batch, 30, 88, 88).astype(np.float32)

    report = {}

    # ---- frontend ----
    with torch.no_grad():
        tv = torch.from_numpy(video)
        tin = tv.unsqueeze(4).permute(0, 4, 1, 2, 3)
        tfe = tmodel.visual_frontend(tin).numpy()
    jfe = np.asarray(model.frontend.apply(
        {"params": params["frontend"],
         "batch_stats": batch_stats["frontend"]},
        jnp.asarray(video)[..., None], train=False))
    report["frontend_max_diff"] = float(np.abs(tfe - jfe).max())

    # ---- encoder ----
    with torch.no_grad():
        tenc, = tmodel.encoder(torch.from_numpy(tfe),
                               [30] * batch)
    tenc = tenc.numpy()
    jenc = np.asarray(model.encoder.apply(
        {"params": params["encoder"]}, jnp.asarray(tfe)))
    report["encoder_max_diff"] = float(np.abs(tenc - jenc).max())

    # ---- bidirectional greedy recognize (aliased fusion) ----
    with torch.no_grad():
        t_l2r, t_r2l = tmodel.decoder.recognize_beam(torch.from_numpy(tenc))
    j_l2r, j_r2l = model.decoder.apply(
        {"params": params["decoder"]}, jnp.asarray(tenc),
        method=model.decoder.recognize)
    t_l2r, t_r2l = t_l2r.numpy(), t_r2l.numpy()
    j_l2r, j_r2l = np.asarray(j_l2r), np.asarray(j_r2l)
    report["l2r_token_match"] = float((t_l2r == j_l2r).mean())
    report["r2l_token_match"] = float((t_r2l == j_r2l).mean())

    # ---- end-to-end recognize ----
    with torch.no_grad():
        e_l2r, e_r2l = tmodel.recognize(torch.from_numpy(video))
    f_l2r, f_r2l = model.apply(variables, jnp.asarray(video),
                               method=model.recognize)
    report["e2e_l2r_token_match"] = float(
        (e_l2r.numpy() == np.asarray(f_l2r)).mean())
    report["e2e_r2l_token_match"] = float(
        (e_r2l.numpy() == np.asarray(f_r2l)).mean())

    if verbose:
        for k, v in report.items():
            print(f"{k}: {v}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    report = run(args.reference, args.batch)
    ok = (report["frontend_max_diff"] < 1e-2
          and report["encoder_max_diff"] < 1e-2
          and report["e2e_l2r_token_match"] > 0.95
          and report["e2e_r2l_token_match"] > 0.95)
    print("PARITY", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
