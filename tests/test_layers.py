import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.models.layers import (
    MultiHeadAttention, PositionwiseFeedForward, EncoderLayer,
    sinusoid_position_encoding)
from sbl_for_multilingual_lip_reading_tpu.ops import masks as M

D = 32


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_sinusoid_pe_matches_formula():
    pe = sinusoid_position_encoding(50, 16)
    pos, i = 7, 3
    div = np.exp(2 * i * -(np.log(10000.0) / 16))
    assert abs(pe[pos, 2 * i] - np.sin(pos * div)) < 1e-6
    assert abs(pe[pos, 2 * i + 1] - np.cos(pos * div)) < 1e-6
    assert pe.shape == (50, 16)


def test_mha_shapes_and_mask(rng):
    mha = MultiHeadAttention(d_model=D, n_head=4, d_k=8, d_v=8, dropout=0.0)
    x = jax.random.normal(rng, (2, 5, D))
    params = mha.init(rng, x, x, x)
    out = mha.apply(params, x, x, x)
    assert out.shape == (2, 5, D)

    # causal mask: output at position t must not depend on positions > t
    mask = M.causal_mask(5)[None]
    out1 = mha.apply(params, x, x, x, mask=mask)
    x2 = x.at[:, 3:].set(jax.random.normal(jax.random.PRNGKey(9), (2, 2, D)))
    out2 = mha.apply(params, x2, x2, x2, mask=mask)
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], atol=1e-5)
    assert not np.allclose(out1[:, 3:], out2[:, 3:])


def test_mha_postln_residual(rng):
    # with zeroed value/out projections, output must equal LayerNorm(q)
    mha = MultiHeadAttention(d_model=D, n_head=4, d_k=8, d_v=8, dropout=0.0)
    x = jax.random.normal(rng, (2, 5, D))
    params = mha.init(rng, x, x, x)
    p = jax.tree_util.tree_map(jnp.zeros_like, params)
    # keep LN scale at 1
    p = jax.tree_util.tree_map(lambda a: a, p)
    p["params"]["layer_norm"]["scale"] = jnp.ones_like(
        params["params"]["layer_norm"]["scale"])
    out = mha.apply(p, x, x, x)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    expect = (x - mean) / jnp.sqrt(var + 1e-6)
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_ffn_shapes(rng):
    ffn = PositionwiseFeedForward(d_model=D, d_inner=64, dropout=0.0)
    x = jax.random.normal(rng, (2, 5, D))
    params = ffn.init(rng, x)
    out = ffn.apply(params, x)
    assert out.shape == x.shape


def test_encoder_layer_nonpad_zeroing(rng):
    layer = EncoderLayer(d_model=D, d_inner=64, n_head=4, d_k=8, d_v=8,
                         dropout=0.0)
    x = jax.random.normal(rng, (2, 6, D))
    lengths = jnp.array([4, 6])
    non_pad = M.non_pad_mask_from_lengths(lengths, 6)
    slf = M.key_pad_mask_from_lengths(lengths, 6)
    params = layer.init(rng, x)
    out = layer.apply(params, x, non_pad_mask=non_pad, slf_attn_mask=slf)
    # padded positions of sample 0 are zeroed
    np.testing.assert_allclose(out[0, 4:], 0.0, atol=1e-6)
    assert float(jnp.abs(out[1, 4:]).sum()) > 0


def test_masks():
    cm = M.causal_mask(4)
    assert bool(cm[0, 1]) and not bool(cm[1, 0]) and not bool(cm[2, 2])
    kp = M.key_pad_mask_from_ids(jnp.array([[5, 1, 1]]), pad_id=1)
    assert kp.shape == (1, 1, 3)
    assert not bool(kp[0, 0, 0]) and bool(kp[0, 0, 1])
    npm = M.non_pad_mask_from_lengths(jnp.array([2]), 4)
    np.testing.assert_array_equal(np.asarray(npm[0, :, 0]), [1, 1, 0, 0])
