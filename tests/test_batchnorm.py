"""Pallas train-mode BatchNorm (ops/batchnorm.py) vs flax nn.BatchNorm.

The kernel pair replaces XLA's standalone stat-reduce fusions on the
frontend's train path (reference video_frontend.py:111-158 semantics via
flax); these tests pin forward values, returned statistics, the custom-VJP
gradients, and the FastBatchNorm module's variable-layout compatibility
with nn.BatchNorm (checkpoint interchange).  All run in interpret mode on
the CPU mesh.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.ops.batchnorm import (
    bn_train, channel_sums, channel_sums_pair)
from sbl_for_multilingual_lip_reading_tpu.models import frontend as frontend_mod
from sbl_for_multilingual_lip_reading_tpu.models.frontend import FastBatchNorm


def _ref_bn(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(xf * xf, axis=axes) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * inv * scale + bias).astype(x.dtype)
    return y, mean, var


def test_channel_sums():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 8)), jnp.float32)
    s, q = channel_sums(x, interpret=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(x.sum((0, 1))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), np.asarray((x * x).sum((0, 1))),
                               rtol=1e-5)


def test_channel_sums_pair():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 6, 8)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((4, 6, 8)), jnp.float32)
    mean = x.mean((0, 1))
    inv = jax.lax.rsqrt(jnp.var(x, axis=(0, 1)) + 1e-5)
    sd, sx = channel_sums_pair(dy, x, mean, inv, interpret=True)
    xhat = (x - mean) * inv
    np.testing.assert_allclose(np.asarray(sd), np.asarray(dy.sum((0, 1))),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sx),
                               np.asarray((dy * xhat).sum((0, 1))),
                               rtol=1e-5, atol=1e-5)


def test_bn_train_forward_matches_reference():
    rng = np.random.default_rng(2)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((6, 5, 5, 16)) * 2 + 0.7, dtype)
        scale = jnp.asarray(rng.standard_normal(16) * 0.2 + 1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
        y, mean, var = bn_train(x, scale, bias, 1e-5, True)
        ye, me, ve = _ref_bn(x, scale, bias)
        assert y.dtype == dtype and mean.dtype == jnp.float32
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(y, np.float32),
                                   np.asarray(ye, np.float32), atol=tol)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(me),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), np.asarray(ve),
                                   rtol=1e-4, atol=1e-6)


def test_bn_train_gradients_match_reference():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 3, 3, 8)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(8) * 0.3 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss_k(x, s, b):
        y, _, _ = bn_train(x, s, b, 1e-5, True)
        return jnp.sum(y * w)

    def loss_r(x, s, b):
        y, _, _ = _ref_bn(x, s, b)
        return jnp.sum(y * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_bn_train_stat_cotangents():
    """Cotangents arriving on the returned (mean, var) must flow to dx —
    the running-stat EMA never differentiates them, but the VJP claims
    correctness so pin it against the reference."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 3, 8)), jnp.float32)
    scale = jnp.ones(8, jnp.float32)
    bias = jnp.zeros(8, jnp.float32)
    wm = jnp.asarray(rng.standard_normal(8), jnp.float32)
    wv = jnp.asarray(rng.standard_normal(8), jnp.float32)

    def loss_k(x):
        _, m, v = bn_train(x, scale, bias, 1e-5, True)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    def loss_r(x):
        _, m, v = _ref_bn(x, scale, bias)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_k)(x)),
                               np.asarray(jax.grad(loss_r)(x)),
                               rtol=1e-4, atol=1e-6)


def test_fast_batchnorm_module_matches_nn_batchnorm():
    """Same variable layout, same train outputs, same EMA update, same eval
    affine as nn.BatchNorm — checkpoints interchange."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((6, 4, 4, 8)) + 0.3, jnp.float32)

    fast = FastBatchNorm(momentum=0.9, epsilon=1e-5, interpret=True)
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_bias=True,
                       use_scale=True)
    vf = fast.init(jax.random.PRNGKey(0), x, use_running_average=True)
    vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=True)
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vr)

    # perturb params so scale/bias actually matter
    vf = jax.tree_util.tree_map(lambda a: a + 0.25, vf)
    vr = jax.tree_util.tree_map(lambda a: a + 0.25, vr)

    yf, mf = fast.apply(vf, x, use_running_average=False,
                        mutable=["batch_stats"])
    yr, mr = ref.apply(vr, x, use_running_average=False,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mf["batch_stats"][k]),
            np.asarray(mr["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    # eval mode from the updated stats
    vf2 = {**vf, "batch_stats": mf["batch_stats"]}
    vr2 = {**vr, "batch_stats": mr["batch_stats"]}
    ye_f = fast.apply(vf2, x, use_running_average=True)
    ye_r = ref.apply(vr2, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(ye_f), np.asarray(ye_r), atol=1e-5)


def test_frontend_wiring_fast_bn(monkeypatch):
    """With the TPU gate forced on, the frontend builds FastBatchNorm in
    place of nn.BatchNorm with an identical variable tree, and the train
    forward+grad agree with the nn.BatchNorm build."""
    monkeypatch.setattr(frontend_mod, "_use_fast_bn", lambda: True)
    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        VisualFrontend)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 1)), jnp.float32)
    kw = dict(conv3d_channels=8, resnet_channels=(8, 12),
              resnet_blocks=(1, 1), feature_dim=12, dtype=jnp.float32)
    m_fast = VisualFrontend(use_pallas_bn=True, **kw)
    m_ref = VisualFrontend(use_pallas_bn=False, **kw)
    v_fast = m_fast.init(jax.random.PRNGKey(1), x)
    v_ref = m_ref.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v_fast)
            == jax.tree_util.tree_structure(v_ref))

    def run(m, v):
        def loss(p):
            y, _ = m.apply({**v, "params": p}, x, train=True,
                           deterministic=True, mutable=["batch_stats"])
            return jnp.sum(y * y)
        return jax.value_and_grad(loss)(v["params"])

    lf, gf = run(m_fast, v_fast)
    lr, gr = run(m_ref, v_ref)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_r = jax.tree_util.tree_leaves(gr)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
