import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.models.decoder_sbl import (
    SBLDecoder, preprocess_targets, _fuse)
from sbl_for_multilingual_lip_reading_tpu.vocab import IGNORE_ID, SOS_ID, EOS_ID

V, DM, T_ENC = 12, 32, 5
MAXLEN = 6


def make_decoder(fusion="symmetric", tf_rate=0.5, dropout=0.0, segments=4):
    return SBLDecoder(vocab_size=V, d_model=DM, n_layers=2, n_head=4,
                      d_k=8, d_v=8, d_inner=64, dropout=dropout,
                      maxlen=MAXLEN, fusion_mode=fusion,
                      teacher_forcing_rate=tf_rate, decode_segments=segments)


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (2, T_ENC, DM))
    labels = jnp.array([[3, 4, 5, IGNORE_ID], [6, 7, IGNORE_ID, IGNORE_ID]],
                       jnp.int32)
    labels_r = jnp.array([[5, 4, 3, IGNORE_ID], [7, 6, IGNORE_ID, IGNORE_ID]],
                         jnp.int32)
    dec = make_decoder(tf_rate=1.0)
    params = dec.init({"params": rng, "dropout": rng, "teacher": rng},
                      labels, labels_r, enc, deterministic=True)
    return dec, params, enc, labels, labels_r


def test_preprocess_targets():
    labels = jnp.array([[3, 4, IGNORE_ID, IGNORE_ID]], jnp.int32)
    gold = preprocess_targets(labels, 6)
    # reference pads gold with eos (decoder.py:74-75): [3,4,eos,eos,eos,eos]
    np.testing.assert_array_equal(np.asarray(gold[0]),
                                  [3, 4, EOS_ID, EOS_ID, EOS_ID, EOS_ID])


def _np_reference_fusion(a, b, step, aliased):
    """Direct numpy simulation of the reference's fusion loops
    (decoder.py:132-143), including the in-place aliasing when requested."""
    L = step + 1
    a = a.copy()
    b = b.copy()
    left = a if aliased else a.copy()
    right = b if aliased else b.copy()
    src_a = a if aliased else a.copy()
    src_b = b if aliased else b.copy()
    for n in range(L):
        left[:, n] = src_a[:, n] + src_b[:, L - 1 - n]
    for n in range(L):
        right[:, n] = src_b[:, n] + src_a[:, L - 1 - n]
    return left, right


def test_fusion_symmetric_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(2, 7, 4).astype(np.float32)
    b = rng.randn(2, 7, 4).astype(np.float32)
    for step in range(7):
        fa, fb = _fuse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(step),
                       "symmetric")
        ra, rb = _np_reference_fusion(a, b, step, aliased=False)
        np.testing.assert_allclose(np.asarray(fa)[:, :step + 1],
                                   ra[:, :step + 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(fb)[:, :step + 1],
                                   rb[:, :step + 1], atol=1e-6)


def test_fusion_aliased_matches_reference_inplace_semantics():
    rng = np.random.RandomState(1)
    a = rng.randn(2, 7, 4).astype(np.float32)
    b = rng.randn(2, 7, 4).astype(np.float32)
    for step in range(7):
        fa, fb = _fuse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(step),
                       "reference_aliased")
        ra, rb = _np_reference_fusion(a, b, step, aliased=True)
        np.testing.assert_allclose(np.asarray(fa)[:, :step + 1],
                                   ra[:, :step + 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(fb)[:, :step + 1],
                                   rb[:, :step + 1], atol=1e-6)


def test_forward_shapes_and_gold(setup):
    dec, params, enc, labels, labels_r = setup
    rngs = {"dropout": jax.random.PRNGKey(1), "teacher": jax.random.PRNGKey(2)}
    p_l2r, g_l2r, p_r2l, g_r2l = dec.apply(params, labels, labels_r, enc,
                                           deterministic=False, rngs=rngs)
    assert p_l2r.shape == (2, MAXLEN, V) and p_r2l.shape == (2, MAXLEN, V)
    np.testing.assert_array_equal(np.asarray(g_l2r[0]),
                                  [3, 4, 5, EOS_ID, EOS_ID, EOS_ID])
    np.testing.assert_array_equal(np.asarray(g_r2l[1]),
                                  [7, 6, EOS_ID, EOS_ID, EOS_ID, EOS_ID])


def test_step_causality_under_full_teacher_forcing(setup):
    """With teacher forcing rate 1.0, step-i logits depend only on gold
    tokens < i: perturbing gold at positions >= i must not change them."""
    dec, params, enc, labels, labels_r = setup
    rngs = {"dropout": jax.random.PRNGKey(1), "teacher": jax.random.PRNGKey(2)}
    p1, _, _, _ = dec.apply(params, labels, labels_r, enc,
                            deterministic=False, rngs=rngs)
    labels2 = labels.at[:, 2].set(9)  # change the 3rd token
    p2, _, _, _ = dec.apply(params, labels2, labels_r, enc,
                            deterministic=False, rngs=rngs)
    # steps 0..2 read inputs sos,g0,g1 only -> unchanged
    np.testing.assert_allclose(np.asarray(p1[:, :3]), np.asarray(p2[:, :3]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(p1[:, 3]), np.asarray(p2[:, 3]))


def test_recognize_greedy_consistency(setup):
    """Greedy decode tokens must equal the argmax chain of a deterministic
    forward with teacher forcing disabled (model feedback)."""
    dec, params, enc, labels, labels_r = setup
    ys_l2r, ys_r2l = dec.apply(params, enc, method=dec.recognize)
    assert ys_l2r.shape == (2, MAXLEN + 1)
    assert np.all(np.asarray(ys_l2r[:, 0]) == SOS_ID)
    # deterministic forward (use_gold all False when deterministic=True)
    p_l2r, _, p_r2l, _ = dec.apply(params, labels, labels_r, enc,
                                   deterministic=True)
    np.testing.assert_array_equal(np.asarray(ys_l2r[:, 1:]),
                                  np.argmax(np.asarray(p_l2r), -1))
    np.testing.assert_array_equal(np.asarray(ys_r2l[:, 1:]),
                                  np.argmax(np.asarray(p_r2l), -1))


def test_fusion_modes_differ(setup):
    dec_a = make_decoder(fusion="reference_aliased", tf_rate=1.0)
    _, params, enc, labels, labels_r = setup
    p_sym, _, _, _ = setup[0].apply(params, labels, labels_r, enc,
                                    deterministic=True)
    p_ali, _, _, _ = dec_a.apply(params, labels, labels_r, enc,
                                 deterministic=True)
    assert not np.allclose(np.asarray(p_sym), np.asarray(p_ali))


def test_decode_segments_equivalent(setup):
    """Segmented growing-buffer decode must equal the single-scan decode."""
    dec, params, enc, labels, labels_r = setup
    dec1 = make_decoder(tf_rate=1.0, segments=1)
    dec4 = make_decoder(tf_rate=1.0, segments=4)
    ys1 = dec1.apply(params, enc, method=dec1.recognize)
    ys4 = dec4.apply(params, enc, method=dec4.recognize)
    np.testing.assert_array_equal(np.asarray(ys1[0]), np.asarray(ys4[0]))
    np.testing.assert_array_equal(np.asarray(ys1[1]), np.asarray(ys4[1]))
    p1 = dec1.apply(params, labels, labels_r, enc, deterministic=True)
    p4 = dec4.apply(params, labels, labels_r, enc, deterministic=True)
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p4[0]),
                               atol=1e-4)


@pytest.mark.slow
def test_grad_accum_bf16_parity(setup):
    """grad_accum_bf16 hoists the bf16 weight cast out of the decode scan.
    At the production compute dtype (bf16) the FORWARD consumes identical
    bf16 weights either way, so logits must match exactly; init must be
    BIT-identical to the f32-accumulation path (init bypasses the
    transform); grads must come back f32 and differ only by the bf16
    rounding of the per-step dW accumulation."""
    _, _, enc, labels, labels_r = setup
    kw = dict(vocab_size=V, d_model=DM, n_layers=2, n_head=4,
              d_k=8, d_v=8, d_inner=64, dropout=0.0, maxlen=MAXLEN,
              fusion_mode="symmetric", teacher_forcing_rate=1.0,
              decode_segments=4, dtype=jnp.bfloat16)
    dec0 = SBLDecoder(**kw)
    dec1 = SBLDecoder(grad_accum_bf16=True, **kw)
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng, "teacher": rng}
    p0 = dec0.init(rngs, labels, labels_r, enc, deterministic=True)
    p1 = dec1.init(rngs, labels, labels_r, enc, deterministic=True)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: a.dtype == b.dtype and bool(jnp.all(a == b)), p1, p0))

    def loss(p, d):
        lg_l2r, _, lg_r2l, _ = d.apply(p, labels, labels_r, enc,
                                       deterministic=True)
        return jnp.mean(lg_l2r ** 2) + jnp.mean(lg_r2l ** 2)

    out0 = dec0.apply(p0, labels, labels_r, enc, deterministic=True)
    out1 = dec1.apply(p0, labels, labels_r, enc, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out0[0]), np.asarray(out1[0]))

    l0, g0 = jax.value_and_grad(loss)(p0, dec0)
    l1, g1 = jax.value_and_grad(loss)(p0, dec1)
    assert float(l1) == float(l0)  # same forward, same loss
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        assert b.dtype == a.dtype  # grads come back f32
        na = float(jnp.linalg.norm(a.astype(jnp.float32)))
        nd = float(jnp.linalg.norm((b - a).astype(jnp.float32)))
        # per-leaf L2 error bounded by bf16 accumulation rounding
        assert nd <= 0.05 * na + 1e-6
