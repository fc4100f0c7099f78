"""utils/flops.py: analytic model-FLOPs cross-checked against XLA.

The analytic counter feeds the MFU numbers stamped by bench.py and
tools/train_split_probe.py; these tests pin its arithmetic against XLA's
own cost analysis of the compiled graphs (CPU backend, einsum attention
path) at reduced dims, and against the hand-derived full-dims anchors
from BENCH/README round notes.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.utils import flops as F


def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):            # older jax returns [dict]
        ca = ca[0]
    if not ca or "flops" not in ca:
        pytest.skip("backend exposes no cost analysis")
    return float(ca["flops"])


def _small_cfg():
    cfg = C.sbl()
    return dataclasses.replace(
        cfg,
        dims=dataclasses.replace(cfg.dims, d_model=128, d_inner=256,
                                 n_enc_layers=2, n_dec_layers=2, n_head=4,
                                 d_k=32, d_v=32, dropout=0.0),
        frontend=dataclasses.replace(cfg.frontend,
                                     resnet_channels=(16, 32, 64, 128),
                                     feature_dim=128, dropout=0.0),
        data=dataclasses.replace(cfg.data, frames=8, raw_size=48,
                                 crop_size=44),
        remat_frontend=False, remat_decoder=False,
        use_pallas_attention=False)


def test_frontend_flops_matches_xla():
    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        VisualFrontend)
    cfg = _small_cfg()
    fe = VisualFrontend(resnet_channels=cfg.frontend.resnet_channels,
                        feature_dim=cfg.frontend.feature_dim,
                        dropout=0.0, dtype=jnp.float32,
                        use_pallas_stem=False)
    B, T, S = 1, cfg.data.frames, cfg.data.crop_size
    video = jnp.zeros((B, T, S, S, 1), jnp.float32)
    variables = fe.init({"params": jax.random.PRNGKey(0)}, video,
                        train=False, deterministic=True)

    def fwd(v, x):
        return fe.apply(v, x, train=False, deterministic=True)

    got = _xla_flops(fwd, variables, video)
    want = F.frontend_flops(cfg) * B
    # XLA's cost analysis excludes out-of-bounds (padding) taps from conv
    # flops; the analytic counter uses the standard full-window convention
    # (the MXU computes the padded taps as real MACs).  At these tiny
    # spatial dims (11x11 grid, 3x3 pad-1: 961/1089 valid taps) XLA reads
    # ~12-18% below analytic; elementwise BN/ReLU/pool push the other way.
    assert want * 0.75 < got < want * 1.30, (got, want)


def test_encoder_flops_matches_xla():
    from sbl_for_multilingual_lip_reading_tpu.models.encoder import Encoder
    cfg = _small_cfg()
    d = cfg.dims
    enc = Encoder(d_input=d.d_model, n_layers=d.n_enc_layers,
                  n_head=d.n_head, d_k=d.d_k, d_v=d.d_v, d_model=d.d_model,
                  d_inner=d.d_inner, dropout=0.0, dtype=jnp.float32)
    B, T, d = 1, cfg.data.frames, cfg.dims.d_model
    x = jnp.zeros((B, T, d), jnp.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x,
                         deterministic=True)

    def fwd(v, x):
        return enc.apply(v, x, deterministic=True)

    got = _xla_flops(fwd, variables, x)
    want = F.encoder_flops(cfg) * B
    assert want * 0.90 < got < want * 1.35, (got, want)


def test_fulldims_anchors():
    """Full-dims totals against the independently hand-derived round-1
    estimates (bench.py docstring: frontend ~19G, encoder ~1.2G)."""
    cfg = C.sbl()
    assert 18e9 < F.frontend_flops(cfg) < 20e9
    assert 1.0e9 < F.encoder_flops(cfg) < 1.4e9
    # decode re-attends growing prefixes: strictly more than one
    # teacher-forced parallel pass, far less than 16 full passes
    assert 8e9 < F.sbl_decoder_fwd_flops(cfg) < 20e9
    assert F.train_flops_per_clip(cfg) == pytest.approx(
        3 * F.inference_flops_per_clip(cfg))


def test_mfu_scaling():
    cfg = C.sbl()
    fpc = F.inference_flops_per_clip(cfg)
    assert F.mfu(0.0, fpc) == 0.0
    one_clip = F.mfu(1.0, fpc)
    assert F.mfu(2000.0, fpc) == pytest.approx(2000 * one_clip)
    assert 0 < F.mfu(2600.0, fpc) < 1.0
