"""MXU dot-statistics BatchNorm (ops/bn_dot.py) vs flax nn.BatchNorm and
the DataParallel-parity GroupedBatchNorm.

The op replaces XLA's cross-lane stat-reduce fusions on the frontend's
train path (reference video_frontend.py:111-158 semantics via flax) with
dot_general contractions; pure XLA, so everything here runs natively on
the CPU mesh (no interpret mode needed).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
    DotBatchNorm, GroupedBatchNorm, VisualFrontend)
from sbl_for_multilingual_lip_reading_tpu.ops.bn_dot import bn_train_dot


def _ref_bn(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(xf * xf, axis=axes) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv * scale + bias
    return y, mean, var


def test_bn_train_dot_forward_matches_reference():
    rng = np.random.default_rng(10)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((6, 5, 5, 16)) * 2 + 0.7, dtype)
        scale = jnp.asarray(rng.standard_normal(16) * 0.2 + 1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(16) * 0.1, jnp.float32)
        y, mean, var = bn_train_dot(x, scale, bias, 1e-5, 1)
        ye, me, ve = _ref_bn(x, scale, bias)
        assert y.dtype == jnp.float32 and mean.shape == (1, 16)
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(np.asarray(y), np.asarray(ye), atol=tol)
        np.testing.assert_allclose(np.asarray(mean[0]), np.asarray(me),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var[0]), np.asarray(ve),
                                   rtol=1e-4, atol=1e-6)


def test_bn_train_dot_gradients_match_reference():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 3, 3, 8)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(8) * 0.3 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss_k(x, s, b):
        y, _, _ = bn_train_dot(x, s, b, 1e-5, 1)
        return jnp.sum(y * w)

    def loss_r(x, s, b):
        y, _, _ = _ref_bn(x, s, b)
        return jnp.sum(y * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_dot_batchnorm_module_matches_nn_batchnorm():
    """Same variable layout, train outputs, EMA update, and eval affine as
    nn.BatchNorm — checkpoints interchange."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((6, 4, 4, 8)) + 0.3, jnp.float32)

    dot = DotBatchNorm(groups=1, momentum=0.9, epsilon=1e-5)
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    vd = dot.init(jax.random.PRNGKey(0), x, use_running_average=True)
    vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=True)
    assert (jax.tree_util.tree_structure(vd)
            == jax.tree_util.tree_structure(vr))

    vd = jax.tree_util.tree_map(lambda a: a + 0.25, vd)
    vr = jax.tree_util.tree_map(lambda a: a + 0.25, vr)
    yd, md = dot.apply(vd, x, use_running_average=False,
                       mutable=["batch_stats"])
    yr, mr = ref.apply(vr, x, use_running_average=False,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yr), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(md["batch_stats"][k]),
                                   np.asarray(mr["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)

    vd2 = {**vd, "batch_stats": md["batch_stats"]}
    vr2 = {**vr, "batch_stats": mr["batch_stats"]}
    np.testing.assert_allclose(
        np.asarray(dot.apply(vd2, x, use_running_average=True)),
        np.asarray(ref.apply(vr2, x, use_running_average=True)), atol=1e-5)


def test_dot_batchnorm_grouped_matches_grouped_batchnorm():
    """groups>1: per-group statistics, group-0 running update, and the
    full train forward+grad agree with GroupedBatchNorm."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((8, 3, 3, 6)) * 1.5 - 0.2,
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    dot = DotBatchNorm(groups=4, momentum=0.9, epsilon=1e-5)
    ref = GroupedBatchNorm(groups=4, momentum=0.9, epsilon=1e-5)
    v = ref.init(jax.random.PRNGKey(1), x, use_running_average=False)
    v = jax.tree_util.tree_map(lambda a: a + 0.3, v)

    def run(m):
        def loss(p):
            y, mut = m.apply({**v, "params": p}, x,
                             use_running_average=False,
                             mutable=["batch_stats"])
            return jnp.sum(y * w), mut
        (l, mut), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return l, mut, g

    ld, mutd, gd = run(dot)
    lr, mutr, gr = run(ref)
    np.testing.assert_allclose(float(ld), float(lr), rtol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mutd["batch_stats"][k]),
                                   np.asarray(mutr["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_frontend_wiring_dot_bn():
    """use_dot_bn=True swaps every frontend BN for DotBatchNorm with an
    identical variable tree, and the train forward+grad agree with the
    nn.BatchNorm build."""
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 4, 16, 16, 1)), jnp.float32)
    kw = dict(conv3d_channels=8, resnet_channels=(8, 12),
              resnet_blocks=(1, 1), feature_dim=12, dtype=jnp.float32)
    m_dot = VisualFrontend(use_dot_bn=True, **kw)
    m_ref = VisualFrontend(use_dot_bn=False, **kw)
    v_dot = m_dot.init(jax.random.PRNGKey(1), x)
    v_ref = m_ref.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(v_dot)
            == jax.tree_util.tree_structure(v_ref))

    def run(m, v):
        def loss(p):
            y, mut = m.apply({**v, "params": p}, x, train=True,
                             deterministic=True, mutable=["batch_stats"])
            return jnp.sum(y * y), mut
        (l, mut), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return l, mut, g

    ld, mutd, gd = run(m_dot, v_dot)
    lr, mutr, gr = run(m_ref, v_ref)
    np.testing.assert_allclose(float(ld), float(lr), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(mutd),
                    jax.tree_util.tree_leaves(mutr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
