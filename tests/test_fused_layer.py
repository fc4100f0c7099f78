"""Parity tests for the fused SBL decoder-layer megakernel.

The kernel (ops/decoder_layer.py) must match the module-composed path
(models/decoder_sbl._SBLLayer = MultiHeadAttention + CachedCrossAttention +
PositionwiseFeedForward, dropout off) to numerical tolerance, and the
decoder wired with it must produce identical greedy tokens.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.models.decoder_sbl import (
    SBLDecoder, _SBLLayer)
from sbl_for_multilingual_lip_reading_tpu.ops.decoder_layer import (
    fused_decoder_layer, layer_params_to_args)
from sbl_for_multilingual_lip_reading_tpu.ops import masks as M


def _mk_layer(B=4, L=5, Tk=7, D=32, H=2, dk=16, DI=64, seed=0):
    layer = _SBLLayer(D, H, dk, dk, DI, 0.0, jnp.float32)
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    h = jax.random.normal(ks[0], (B, L, D), jnp.float32)
    kh = jax.random.normal(ks[1], (B, Tk, H, dk), jnp.float32)
    vh = jax.random.normal(ks[2], (B, Tk, H, dk), jnp.float32)
    params = layer.init(ks[3], h, kh, vh, None, True)
    return layer, params, h, kh, vh


@pytest.mark.parametrize("masked", [False, True])
def test_fused_layer_matches_module(masked):
    layer, params, h, kh, vh = _mk_layer()
    B, L, _ = h.shape
    mask = M.causal_mask(L)[None] if masked else None
    ref = layer.apply(params, h, kh, vh, mask, True)

    bias = None
    if masked:
        bias = jnp.where(mask[0], -1e9, 0.0).astype(jnp.float32)
    args = layer_params_to_args(params["params"])
    out = fused_decoder_layer(h, *args, ckh=kh, cvh=vh, mask_bias=bias,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_layer_partial_prefix_mask():
    """The decoder's non-first layers mask keys beyond the live prefix."""
    layer, params, h, kh, vh = _mk_layer(seed=1)
    L = h.shape[1]
    beyond = (jnp.arange(L) > 2)[None, None, :]       # (1, 1, L)
    ref = layer.apply(params, h, kh, vh, beyond, True)
    bias = jnp.where(jnp.broadcast_to(beyond[0], (L, L)), -1e9,
                     0.0).astype(jnp.float32)
    out = fused_decoder_layer(h, *layer_params_to_args(params["params"]),
                              ckh=kh, cvh=vh, mask_bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def _tiny_decoder(**kw):
    base = dict(vocab_size=11, d_model=16, n_layers=2, n_head=2, d_k=8,
                d_v=8, d_inner=32, dropout=0.0, maxlen=4,
                decode_segments=1, dtype=jnp.float32)
    base.update(kw)
    return SBLDecoder(**base)


def test_decoder_fused_layer_recognize_matches():
    """SBLDecoder wired with the megakernel = module path, greedy tokens
    identical and logits within tolerance."""
    dec = _tiny_decoder()
    dec_fused = _tiny_decoder(use_fused_layer=True, fused_interpret=True)
    B, Tk = 3, 6
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    enc = jax.random.normal(k1, (B, Tk, 16), jnp.float32)
    params = dec.init({"params": k2},
                      jnp.zeros((B, 4), jnp.int32), jnp.zeros((B, 4), jnp.int32),
                      enc, True)
    ys_ref = dec.apply(params, enc, method=SBLDecoder.recognize)
    ys_fused = dec_fused.apply(params, enc, method=SBLDecoder.recognize)
    np.testing.assert_array_equal(np.asarray(ys_ref[0]), np.asarray(ys_fused[0]))
    np.testing.assert_array_equal(np.asarray(ys_ref[1]), np.asarray(ys_fused[1]))


def test_decoder_fused_layer_teacher_forced_logits_match():
    dec = _tiny_decoder()
    dec_fused = _tiny_decoder(use_fused_layer=True, fused_interpret=True)
    B = 3
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    enc = jax.random.normal(ks[0], (B, 6, 16), jnp.float32)
    labels = jax.random.randint(ks[1], (B, 4), 3, 11)
    params = dec.init({"params": ks[2]}, labels, labels, enc, True)
    # deterministic=True -> fused path eligible in both directions
    lg_ref = dec.apply(params, labels, labels, enc, True)
    lg_fused = dec_fused.apply(params, labels, labels, enc, True)
    for a, b in zip(lg_ref, lg_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)
