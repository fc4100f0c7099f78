"""Scatter-free max-pool backward (ops/maxpool.py).

The reference pools with MaxPool3d(k=(1,3,3), s=(1,2,2), p=(0,1,1))
(SBL_Multilingual_Lip_reading/transformer/video_frontend.py:97); torch's
backward routes each window's gradient to the first (row-major) maximum,
and so does XLA's select_and_scatter.  These tests pin the custom route
to BIT-IDENTICAL gradients against the select_and_scatter path,
deliberately using small-integer tensors so ties are everywhere.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from sbl_for_multilingual_lip_reading_tpu.ops.maxpool import (
    max_pool_3x3s2, stem_max_pool)


def _ref_pool(v):
    return nn.max_pool(v, (3, 3), (2, 2), ((1, 1), (1, 1)))


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (3, 44, 44, 5),
                                   (1, 4, 6, 2), (2, 16, 16, 64)])
def test_grad_bit_identical_with_ties(shape):
    rng = np.random.default_rng(sum(shape))
    # ints <= 100 are exact in bf16 and collide constantly -> exercises the
    # first-position tie-break on nearly every window
    x = jnp.asarray(rng.integers(0, 100, size=shape), jnp.bfloat16)
    dy = jnp.asarray(
        rng.integers(-8, 8,
                     size=(shape[0], shape[1] // 2, shape[2] // 2, shape[3])),
        jnp.bfloat16)
    ref_y, ref_vjp = jax.vjp(_ref_pool, x)
    y, vjp = jax.vjp(max_pool_3x3s2, x)
    assert jnp.array_equal(y, ref_y)
    assert jnp.array_equal(vjp(dy)[0], ref_vjp(dy)[0])


def test_grad_matches_on_floats():
    # real-valued dy: routing still identical; the only difference is that
    # a position winning several windows sums its dy's in f32 here vs
    # sequential bf16 adds in select_and_scatter -> one-ulp tolerance
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 4)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(2, 6, 6, 4)), jnp.bfloat16)
    _, ref_vjp = jax.vjp(_ref_pool, x)
    _, vjp = jax.vjp(max_pool_3x3s2, x)
    np.testing.assert_allclose(
        np.asarray(vjp(dy)[0], np.float32),
        np.asarray(ref_vjp(dy)[0], np.float32), rtol=2 ** -7, atol=2 ** -7)


def test_stem_max_pool_fallbacks():
    rng = np.random.default_rng(3)
    # f32 -> select_and_scatter path; odd width -> fallback too
    for shape, dtype in [((2, 8, 8, 3), jnp.float32),
                         ((2, 8, 7, 3), jnp.bfloat16)]:
        x = jnp.asarray(rng.normal(size=shape), dtype)
        y, vjp = jax.vjp(stem_max_pool, x)
        ry, rvjp = jax.vjp(_ref_pool, x)
        assert jnp.array_equal(y, ry)
        dy = jnp.ones_like(y)
        assert jnp.array_equal(vjp(dy)[0], rvjp(dy)[0])


def test_stem_max_pool_fast_path_under_jit_grad():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, 50, size=(2, 16, 16, 8)), jnp.bfloat16)

    @jax.jit
    def loss(v):
        return jnp.sum(stem_max_pool(v).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    gr = jax.grad(lambda v: jnp.sum(
        _ref_pool(v).astype(jnp.float32) ** 2))(x)
    assert jnp.array_equal(g, gr)
    hlo = jax.jit(jax.grad(loss)).lower(x).as_text()
    assert "select_and_scatter" not in hlo


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (3, 44, 44, 5),
                                   (2, 16, 16, 64)])
def test_v2_bit_identical_fwd_and_grad(shape):
    from sbl_for_multilingual_lip_reading_tpu.ops.maxpool import (
        max_pool_3x3s2_v2)
    rng = np.random.default_rng(sum(shape) + 1)
    x = jnp.asarray(rng.integers(0, 100, size=shape), jnp.bfloat16)
    dy = jnp.asarray(
        rng.integers(-8, 8,
                     size=(shape[0], shape[1] // 2, shape[2] // 2, shape[3])),
        jnp.bfloat16)
    ref_y, ref_vjp = jax.vjp(_ref_pool, x)
    y, vjp = jax.vjp(max_pool_3x3s2_v2, x)
    # forward values are recovered from the packed winner's value bits --
    # must be BIT-identical, including negatives
    assert jnp.array_equal(y, ref_y)
    assert jnp.array_equal(vjp(dy)[0], ref_vjp(dy)[0])


def test_v2_negative_values_roundtrip():
    from sbl_for_multilingual_lip_reading_tpu.ops.maxpool import (
        max_pool_3x3s2_v2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 12, 12, 4)) - 3.0, jnp.bfloat16)
    assert jnp.array_equal(max_pool_3x3s2_v2(x), _ref_pool(x))
