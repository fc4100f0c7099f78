import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.models.decoder_uni import (
    UniDecoder, preprocess_targets_uni)
from sbl_for_multilingual_lip_reading_tpu.vocab import IGNORE_ID, SOS_ID, EOS_ID

V, DM, T_ENC, MAXLEN = 10, 32, 5, 6


@pytest.fixture(scope="module", params=[True, False],
                ids=["tied", "untied"])
def setup(request):
    dec = UniDecoder(vocab_size=V, d_model=DM, n_layers=2, n_head=4, d_k=8,
                     d_v=8, d_inner=64, dropout=0.0, maxlen=MAXLEN,
                     tie_embedding=request.param)
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (2, T_ENC, DM))
    labels = jnp.array([[3, 4, 5, IGNORE_ID], [6, 7, IGNORE_ID, IGNORE_ID]],
                       jnp.int32)
    params = dec.init({"params": rng, "dropout": rng}, labels, enc,
                      deterministic=True)
    return dec, params, enc, labels


def test_preprocess_uni():
    labels = jnp.array([[3, 4, IGNORE_ID, IGNORE_ID]], jnp.int32)
    ys_in, ys_out = preprocess_targets_uni(labels, 6)
    # input: sos-prefixed, eos-padded (decoder.py:70-74)
    np.testing.assert_array_equal(np.asarray(ys_in[0]),
                                  [SOS_ID, 3, 4, EOS_ID, EOS_ID, EOS_ID])
    # gold: eos-terminated, IGNORE-padded (decoder.py:71-75)
    np.testing.assert_array_equal(np.asarray(ys_out[0]),
                                  [3, 4, EOS_ID, IGNORE_ID, IGNORE_ID,
                                   IGNORE_ID])


def test_forward_shapes(setup):
    dec, params, enc, labels = setup
    pred, gold = dec.apply(params, labels, enc, deterministic=True)
    assert pred.shape == (2, MAXLEN, V)
    assert gold.shape == (2, MAXLEN)


def test_teacher_forced_causality(setup):
    dec, params, enc, labels = setup
    p1, _ = dec.apply(params, labels, enc, deterministic=True)
    labels2 = labels.at[:, 2].set(8)
    p2, _ = dec.apply(params, labels2, enc, deterministic=True)
    # position t sees ys_in[0..t] = [sos, g0, .., g_{t-1}]; changing g2
    # leaves positions 0..2 untouched
    np.testing.assert_allclose(np.asarray(p1[:, :3]), np.asarray(p2[:, :3]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(p1[0, 3]), np.asarray(p2[0, 3]))


def test_greedy_matches_stepwise_argmax(setup):
    dec, params, enc, labels = setup
    ys = dec.apply(params, enc, method=dec.recognize_greedy)
    assert ys.shape == (2, MAXLEN + 1)
    assert np.all(np.asarray(ys[:, 0]) == SOS_ID)
    # verify first predicted token equals argmax of step 0 logits
    step0 = dec.apply(params, ys.at[:, 1:].set(SOS_ID), enc,
                      jnp.asarray(0), method=dec.step_logits)
    np.testing.assert_array_equal(np.asarray(ys[:, 1]),
                                  np.argmax(np.asarray(step0), -1))


def test_cached_greedy_token_identical(setup):
    dec, params, enc, labels = setup
    ys_ref = dec.apply(params, enc, method=dec.recognize_greedy_uncached)
    ys_kv = dec.apply(params, enc, method=dec.recognize_greedy_cached)
    np.testing.assert_array_equal(np.asarray(ys_kv), np.asarray(ys_ref))


def test_cached_step_logits_match_uncached(setup):
    from sbl_for_multilingual_lip_reading_tpu.models.decoder_uni import (
        make_uni_cache)
    dec, params, enc, labels = setup
    B = enc.shape[0]
    L = MAXLEN + 1
    # a fixed token buffer with distinct prefixes
    ys = jnp.array([[SOS_ID, 3, 4, 5, 6, 7, 8],
                    [SOS_ID, 6, 7, 3, 4, 5, 6]], jnp.int32)
    enc_kv = dec.apply(params, enc, method=dec.compute_cross_kv)
    cache = make_uni_cache(B, L, dec.n_layers, dec.n_head * dec.d_k,
                           dec.n_head * dec.d_v, dec.dtype)
    for step in range(L - 1):
        ref = dec.apply(params, ys, enc_kv, jnp.asarray(step),
                        method=dec.step_logits_cached)
        got, cache = dec.apply(params, ys[:, step], cache, enc_kv,
                               jnp.asarray(step),
                               method=dec.decode_step_cached)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
