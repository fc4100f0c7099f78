import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
    fused_mha, mask_to_bias)
from sbl_for_multilingual_lip_reading_tpu.ops import masks as M


def _xla_reference(q, k, v, bias=None):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_fused_mha_matches_xla():
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (2, 4, 8, 16))
               for i in range(3))
    out = fused_mha(q, k, v, interpret=True)
    expect = _xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5)


def test_fused_mha_with_causal_bias():
    rng = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (2, 4, 8, 16))
               for i in range(3))
    mask = jnp.broadcast_to(M.causal_mask(8)[None], (2, 8, 8))
    bias = mask_to_bias(mask)
    # pin f32 dots: on the real chip DEFAULT matmul precision runs f32
    # operands as bf16 passes, and the causal rows' sharp softmax amplifies
    # the 2^-8 rounding past atol (kernel and einsum round differently)
    with jax.default_matmul_precision("highest"):
        out = fused_mha(q, k, v, bias=bias, interpret=True)
        expect = _xla_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5)
    # causality: row 0 only attends key 0 => out[...,0,:] == v[...,0,:]
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               np.asarray(v[:, :, 0]), atol=1e-5)


def test_fused_mha_cross_attention_lengths():
    rng = jax.random.PRNGKey(2)
    q = jax.random.normal(rng, (1, 2, 5, 16))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, 9, 16))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 2, 9, 16))
    out = fused_mha(q, k, v, interpret=True)
    expect = _xla_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_fused_small_mha_matches_xla():
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        fused_small_mha)
    rng = jax.random.PRNGKey(3)
    B, Tq, Tk, H, d = 4, 17, 30, 8, 16
    qh = jax.random.normal(rng, (B, Tq, H, d))
    kh = jax.random.normal(jax.random.fold_in(rng, 1), (B, Tk, H, d))
    vh = jax.random.normal(jax.random.fold_in(rng, 2), (B, Tk, H, d))
    out = fused_small_mha(qh, kh, vh, interpret=True)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
    expect = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), vh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_fused_small_mha_bias_broadcast_and_per_batch():
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        fused_small_mha)
    rng = jax.random.PRNGKey(4)
    B, T, H, d = 4, 9, 4, 16
    qh, kh, vh = (jax.random.normal(jax.random.fold_in(rng, i), (B, T, H, d))
                  for i in range(3))
    causal = jnp.where(M.causal_mask(T), -1e9, 0.0).astype(jnp.float32)
    for bias in (causal[None], jnp.tile(causal[None], (B, 1, 1))):
        out = fused_small_mha(qh, kh, vh, bias=bias, interpret=True)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d) + bias[:, None]
        expect = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), vh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)


def test_small_mha_grad_matches_xla_gradients():
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        small_mha_grad)
    rng = jax.random.PRNGKey(5)
    B, T, H, d = 4, 9, 4, 16
    qh, kh, vh = (jax.random.normal(jax.random.fold_in(rng, i), (B, T, H, d))
                  for i in range(3))
    bias = jnp.where(M.causal_mask(T), -1e9, 0.0)[None].astype(jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def xla_att(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale + bias[:, None]
        return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v)

    gp = jax.grad(lambda q, k, v: jnp.sum(
        small_mha_grad(q, k, v, bias, scale) ** 2), argnums=(0, 1, 2))(
        qh, kh, vh)
    gx = jax.grad(lambda q, k, v: jnp.sum(xla_att(q, k, v) ** 2),
                  argnums=(0, 1, 2))(qh, kh, vh)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-chip default-precision rounding behavior")
def test_fused_mha_causal_default_precision_bounded_on_chip():
    """Round-4 on-chip failure follow-up (ADVICE r4 #4): at DEFAULT matmul
    precision the chip runs f32 operands as bf16 passes and the causal
    rows' sharp softmax amplifies the 2^-8 rounding past the strict 1e-5
    atol (kernel and einsum round differently) -- that is rounding, not a
    kernel bug.  This bounds the divergence at default precision against
    the f32 reference: a genuine indexing/masking bug would be O(1) off,
    bf16 rounding stays ~1e-2 on N(0,1) values.

    ROOT CAUSE (round-5 on-chip run, closing the round-4 'investigation
    pending'): row 0's softmax is exactly [1, 0, ...] so its output is the
    PV dot's rendering of v[..., 0, :] -- and at default precision the MXU
    rounds the V OPERAND to one bf16 pass even when p == 1.0, so row 0
    comes back as bf16(v[0]) (measured max abs diff 0.0073 = bf16 eps on
    N(0,1)), not v[0] exactly.  Causality is still pinned: leakage from
    any other row would shift row 0 by O(0.1-1), far beyond one rounding.
    """
    rng = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i), (2, 4, 8, 16))
               for i in range(3))
    mask = jnp.broadcast_to(M.causal_mask(8)[None], (2, 8, 8))
    bias = mask_to_bias(mask)
    out = fused_mha(q, k, v, bias=bias)          # real Mosaic kernel
    with jax.default_matmul_precision("highest"):
        expect = _xla_reference(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=5e-2)
    row0 = np.asarray(out[:, :, 0])
    v0 = np.asarray(v[:, :, 0])
    v0_bf16 = np.asarray(v[:, :, 0].astype(jnp.bfloat16)
                         .astype(jnp.float32))
    d_exact = np.max(np.abs(row0 - v0))
    d_bf16 = np.max(np.abs(row0 - v0_bf16))
    assert min(d_exact, d_bf16) < 1e-5, (
        f"row 0 is neither v[0] nor bf16(v[0]): exact {d_exact:.2e}, "
        f"bf16 {d_bf16:.2e} -- causality leak, not rounding")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel PRNG needs TPU")
def test_dropout_kernel_exact_vs_xla_with_extracted_mask():
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        dropout_keep_mask, fused_small_mha_dropout_fwd,
        small_mha_dropout_grad)
    rng = jax.random.PRNGKey(0)
    B, T, H, d = 16, 9, 4, 64
    qh, kh, vh = (jax.random.normal(jax.random.fold_in(rng, i), (B, T, H, d))
                  for i in range(3))
    scale = 1.0 / np.sqrt(d)
    seed = jnp.array([77], jnp.int32)
    rate = 0.3
    keep = dropout_keep_mask(B, T, T, H, seed, rate)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.05

    def xla(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        p = jax.nn.softmax(s, -1)
        return jnp.einsum("bhqk,bkhd->bqhd",
                          jnp.where(keep, p, 0.0) / (1 - rate), v)

    out = fused_small_mha_dropout_fwd(qh, kh, vh, None, seed, scale, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla(qh, kh, vh)),
                               atol=1e-5)
    w = jax.random.normal(jax.random.fold_in(rng, 9), (B, T, H, d))
    gk = jax.grad(lambda q: jnp.sum(
        small_mha_dropout_grad(q, kh, vh, None, seed, scale, rate) * w))(qh)
    gx = jax.grad(lambda q: jnp.sum(xla(q, kh, vh) * w))(qh)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=2e-3)


def test_fused_small_mha_flat_matches_headed():
    """Flat (B, T, H*d) kernel == the (B, T, H, d) kernel == einsum."""
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        fused_small_mha, fused_small_mha_flat)
    rng = jax.random.PRNGKey(7)
    B, Tq, Tk, H, d = 4, 17, 30, 8, 16
    q2 = jax.random.normal(rng, (B, Tq, H * d))
    k2 = jax.random.normal(jax.random.fold_in(rng, 1), (B, Tk, H * d))
    v2 = jax.random.normal(jax.random.fold_in(rng, 2), (B, Tk, H * d))
    out = fused_small_mha_flat(q2, k2, v2, H, interpret=True)
    expect = fused_small_mha(q2.reshape(B, Tq, H, d),
                             k2.reshape(B, Tk, H, d),
                             v2.reshape(B, Tk, H, d), interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(expect.reshape(B, Tq, H * d)),
                               atol=1e-5)


def test_fused_small_mha_flat_bias_variants():
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        fused_small_mha, fused_small_mha_flat)
    rng = jax.random.PRNGKey(8)
    B, T, H, d = 4, 9, 2, 8
    q2 = jax.random.normal(rng, (B, T, H * d))
    k2 = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, H * d))
    v2 = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, H * d))
    causal = jnp.where(M.causal_mask(T), -1e9, 0.0)[None]        # (1, T, T)
    perb = jnp.tile(jnp.where(M.causal_mask(T), -1e9, 0.0)[None],
                    (B, 1, 1))                                   # (B, T, T)
    for bias in (causal, perb):
        out = fused_small_mha_flat(q2, k2, v2, H, bias=bias, interpret=True)
        expect = fused_small_mha(q2.reshape(B, T, H, d),
                                 k2.reshape(B, T, H, d),
                                 v2.reshape(B, T, H, d), bias=bias,
                                 interpret=True).reshape(B, T, H * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)


def test_small_mha_dropout_grad_flat_rate0_matches_xla_gradients():
    """Flat custom-VJP train kernel at rate=0: forward and all three input
    gradients must match the einsum reference (both bias variants)."""
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        small_mha_dropout_grad_flat)
    rng = jax.random.PRNGKey(11)
    B, Tq, Tk, H, d = 4, 9, 9, 4, 16
    q2 = jax.random.normal(rng, (B, Tq, H * d))
    k2 = jax.random.normal(jax.random.fold_in(rng, 1), (B, Tk, H * d))
    v2 = jax.random.normal(jax.random.fold_in(rng, 2), (B, Tk, H * d))
    scale = 1.0 / np.sqrt(d)
    seed = jnp.zeros((1,), jnp.int32)
    causal = jnp.where(M.causal_mask(Tq), -1e9, 0.0)[None].astype(jnp.float32)
    perb = jnp.tile(causal, (B, 1, 1))

    for bias in (None, causal, perb):
        def xla_att(q, k, v):
            qh = q.reshape(B, Tq, H, d)
            kh = k.reshape(B, Tk, H, d)
            vh = v.reshape(B, Tk, H, d)
            s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
            if bias is not None:
                s = s + bias[:, None]
            out = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), vh)
            return out.reshape(B, Tq, H * d)

        out = small_mha_dropout_grad_flat(q2, k2, v2, bias, seed, H, scale,
                                          0.0)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(xla_att(q2, k2, v2)),
                                   atol=1e-5)
        gp = jax.grad(lambda q, k, v: jnp.sum(
            small_mha_dropout_grad_flat(q, k, v, bias, seed, H, scale,
                                        0.0) ** 2),
            argnums=(0, 1, 2))(q2, k2, v2)
        gx = jax.grad(lambda q, k, v: jnp.sum(xla_att(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q2, k2, v2)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def test_small_mha_dropout_grad_flat_vmaps():
    """The SBL decoder direction-vmaps the attention kernels; the flat
    train pair must batch correctly under vmap (values and grads)."""
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        small_mha_dropout_grad_flat)
    rng = jax.random.PRNGKey(12)
    D2, B, T, H, d = 2, 2, 5, 2, 8
    q2 = jax.random.normal(rng, (D2, B, T, H * d))
    k2 = jax.random.normal(jax.random.fold_in(rng, 1), (D2, B, T, H * d))
    v2 = jax.random.normal(jax.random.fold_in(rng, 2), (D2, B, T, H * d))
    scale = 1.0 / np.sqrt(d)
    seed = jnp.zeros((1,), jnp.int32)

    def one(q, k, v):
        return small_mha_dropout_grad_flat(q, k, v, None, seed, H, scale,
                                           0.0)

    out = jax.vmap(one)(q2, k2, v2)
    expect = jnp.stack([one(q2[i], k2[i], v2[i]) for i in range(D2)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5)
    g = jax.grad(lambda q: jnp.sum(jax.vmap(one)(q, k2, v2) ** 2))(q2)
    ge = jax.grad(lambda q: jnp.sum(
        jnp.stack([one(q[i], k2[i], v2[i]) for i in range(D2)]) ** 2))(q2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ge), atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="in-kernel PRNG needs TPU")
def test_flat_dropout_kernel_exact_vs_xla_with_extracted_mask():
    from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
        dropout_keep_mask_flat, fused_small_mha_dropout_fwd_flat,
        small_mha_dropout_grad_flat)
    rng = jax.random.PRNGKey(0)
    B, T, H, d = 16, 9, 4, 64
    q2 = jax.random.normal(rng, (B, T, H * d))
    k2 = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, H * d))
    v2 = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, H * d))
    scale = 1.0 / np.sqrt(d)
    seed = jnp.array([77], jnp.int32)
    rate = 0.3
    keep = dropout_keep_mask_flat(B, T, T, H, seed, rate)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.05

    def xla(q, k, v):
        qh = q.reshape(B, T, H, d)
        kh = k.reshape(B, T, H, d)
        vh = v.reshape(B, T, H, d)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        p = jax.nn.softmax(s, -1)
        out = jnp.einsum("bhqk,bkhd->bqhd",
                         jnp.where(keep, p, 0.0) / (1 - rate), vh)
        return out.reshape(B, T, H * d)

    out = fused_small_mha_dropout_fwd_flat(q2, k2, v2, H, None, seed, scale,
                                           rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla(q2, k2, v2)),
                               atol=1e-5)
    w = jax.random.normal(jax.random.fold_in(rng, 9), (B, T, H * d))
    gk = jax.grad(lambda q: jnp.sum(
        small_mha_dropout_grad_flat(q, k2, v2, None, seed, H, scale,
                                    rate) * w))(q2)
    gx = jax.grad(lambda q: jnp.sum(xla(q, k2, v2) * w))(q2)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=2e-3)
