"""Fused minimal-residual BN(+res)+ReLU (ops/bn_relu.py, FusedBNAct).

Gradient/forward parity against the composed autodiff reference for every
configuration the frontend uses: groups 1 / >1, with/without the residual
add, relu on/off, f32 and bf16 activations; plus module-level parity with
the nn.BatchNorm / GroupedBatchNorm paths it replaces (same variable
layout, same running-stat updates)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.ops.bn_relu import bn_act_train

EPS = 1e-5


def _composed(x, scale, bias, res, groups, relu):
    """The exact math FusedBNAct replaces (GroupedBatchNorm + cast + add +
    relu, see models/frontend.py)."""
    xf = x.astype(jnp.float32)
    g = groups
    N = x.shape[0]
    xg = xf.reshape((g, N // g) + x.shape[1:])
    axes = tuple(range(1, xg.ndim - 1))
    mean = jnp.mean(xg, axes)
    var = jnp.mean(jnp.square(xg), axes) - jnp.square(mean)
    shape = (g,) + (1,) * len(axes) + (x.shape[-1],)
    inv = jax.lax.rsqrt(var + EPS).reshape(shape)
    y = (xg - mean.reshape(shape)) * inv * scale + bias
    y = y.reshape(x.shape).astype(x.dtype)
    if res is not None:
        y = y + res.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


@pytest.mark.parametrize("groups", [1, 3])
@pytest.mark.parametrize("with_res", [False, True])
@pytest.mark.parametrize("relu", [False, True])
def test_grad_parity_f32(groups, with_res, relu):
    k = jax.random.PRNGKey(hash((groups, with_res, relu)) % 2**31)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    N, H, W, C = 6, 4, 5, 7
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32)
    scale = jax.random.normal(k2, (C,)) * 0.3 + 1.0
    bias = jax.random.normal(k3, (C,)) * 0.2
    res = jax.random.normal(k4, (N, H, W, C)) if with_res else None
    dy = jax.random.normal(jax.random.PRNGKey(99), (N, H, W, C))

    def loss_fused(x, s, b, r):
        y, _, _ = bn_act_train(x, s, b, r, eps=EPS, groups=groups, relu=relu)
        return jnp.sum(y * dy)

    def loss_ref(x, s, b, r):
        return jnp.sum(_composed(x, s, b, r, groups, relu) * dy)

    args = (x, scale, bias, res) if with_res else (x, scale, bias, None)
    argnums = (0, 1, 2, 3) if with_res else (0, 1, 2)
    gf = jax.grad(loss_fused, argnums)(*args)
    gr = jax.grad(loss_ref, argnums)(*args)
    yf, mean, var = bn_act_train(x, scale, bias, res, eps=EPS, groups=groups,
                                 relu=relu)
    yr = _composed(x, scale, bias, res, groups, relu)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    assert mean.shape == (groups, C) and var.shape == (groups, C)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_grad_parity_bf16():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    N, H, W, C = 8, 6, 6, 5
    x = jax.random.normal(k1, (N, H, W, C), jnp.float32).astype(jnp.bfloat16)
    res = jax.random.normal(k2, (N, H, W, C)).astype(jnp.bfloat16)
    scale = jnp.linspace(0.5, 1.5, C)
    bias = jnp.linspace(-0.3, 0.3, C)
    dy = jnp.ones((N, H, W, C), jnp.bfloat16)

    def loss(f, x, r):
        return jnp.sum(f(x, r).astype(jnp.float32) * dy.astype(jnp.float32))

    fused = lambda x, r: bn_act_train(x, scale, bias, r, eps=EPS, groups=2)[0]
    ref = lambda x, r: _composed(x, scale, bias, r, 2, True)
    gx_f, gr_f = jax.grad(functools.partial(loss, fused), (0, 1))(x, res)
    gx_r, gr_r = jax.grad(functools.partial(loss, ref), (0, 1))(x, res)
    # bf16 activations: the fused path computes the mask from the cast
    # value exactly like the composed path, so grads agree to bf16 noise
    np.testing.assert_allclose(np.asarray(gx_f).astype(np.float32),
                               np.asarray(gx_r).astype(np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(gr_f).astype(np.float32),
                               np.asarray(gr_r).astype(np.float32),
                               rtol=0.05, atol=0.05)


def test_relu_mask_zero_region():
    """Positions clipped by the ReLU still receive the BN coupling gradient
    (through the batch statistics), and the residual grad is exactly the
    masked dy."""
    x = jnp.array([[-5.0, 1.0], [2.0, -3.0], [0.5, 4.0], [-1.0, -2.0]],
                  jnp.float32)
    res = jnp.zeros_like(x)
    scale, bias = jnp.ones((2,)), jnp.zeros((2,))

    def loss(x, r):
        y, _, _ = bn_act_train(x, scale, bias, r, eps=EPS, groups=1)
        return jnp.sum(y)

    gx, gres = jax.grad(loss, (0, 1))(x, res)
    y, _, _ = bn_act_train(x, scale, bias, res, eps=EPS, groups=1)
    np.testing.assert_allclose(np.asarray(gres), np.asarray(y > 0))
    # composed reference
    gx_ref = jax.grad(lambda x: jnp.sum(_composed(x, scale, bias, None, 1,
                                                  True)))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-6)


def test_module_matches_composed_paths():
    """FusedBNAct module == nn.BatchNorm+relu (groups=1) and
    GroupedBatchNorm+relu (groups>1): outputs, grads, and running-stat
    updates, in train and eval."""
    from flax import linen as nn

    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        FusedBNAct, GroupedBatchNorm)

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (6, 3, 3, 4), jnp.float32) * 2 + 0.5

    for groups in (1, 3):
        fm = FusedBNAct(groups=groups, momentum=0.9, epsilon=EPS, relu=True)
        gm = GroupedBatchNorm(groups=groups, momentum=0.9, epsilon=EPS)
        vf = fm.init(k, x, use_running_average=False)
        vg = gm.init(k, x, use_running_average=False)
        jax.tree_util.tree_map(  # identical variable layout
            lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
            vf, vg)

        yf, mf = fm.apply(vf, x, use_running_average=False,
                          mutable=["batch_stats"])
        yg, mg = gm.apply(vg, x, use_running_average=False,
                          mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf),
                                   np.asarray(jax.nn.relu(yg)),
                                   rtol=1e-5, atol=1e-5)
        for key in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mf["batch_stats"][key]),
                np.asarray(mg["batch_stats"][key]), rtol=1e-5, atol=1e-6)

        # eval parity
        ye = fm.apply(vf, x, use_running_average=True)
        yge = gm.apply(vg, x, use_running_average=True)
        np.testing.assert_allclose(np.asarray(ye),
                                   np.asarray(jax.nn.relu(yge)),
                                   rtol=1e-5, atol=1e-5)


def test_frontend_fused_vs_composed_end_to_end():
    """Whole VisualFrontend: fused path == composed path (params shared;
    value + grad + batch_stats parity) at f32 test dims."""
    import os

    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        VisualFrontend)

    kw = dict(conv3d_channels=4, resnet_channels=(4, 8, 8, 16),
              resnet_blocks=(1, 1, 1, 1), feature_dim=16, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 24, 24, 1))

    fe_f = VisualFrontend(use_fused_bn_act=True, **kw)
    fe_c = VisualFrontend(use_fused_bn_act=False, **kw)
    assert not os.environ.get("FUSED_BN_ACT")  # knob would defeat the A/B
    params = fe_c.init(rng, x, train=False)
    assert jax.tree_util.tree_structure(
        fe_f.init(rng, x, train=False)) == jax.tree_util.tree_structure(
        params)

    def run(fe, p, x):
        return fe.apply(p, x, train=True, deterministic=True,
                        mutable=["batch_stats"])

    yf, sf = run(fe_f, params, x)
    yc, sc = run(fe_c, params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yc),
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        sf["batch_stats"], sc["batch_stats"])

    def loss(fe, p, x):
        y, _ = run(fe, p, x)
        return jnp.sum(jnp.square(y))

    gf = jax.grad(lambda p: loss(fe_f, p, x))(params)["params"]
    gc = jax.grad(lambda p: loss(fe_c, p, x))(params)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
        gf, gc)


def test_eval_exactness_vs_nn_batchnorm():
    """Eval path (affine fold) matches flax nn.BatchNorm inference closely
    after nontrivial running stats."""
    from flax import linen as nn

    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        FusedBNAct)

    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (4, 5, 5, 3), jnp.float32)
    fm = FusedBNAct(groups=1, relu=False, epsilon=EPS)
    v = fm.init(k, x, use_running_average=False)
    v = jax.tree_util.tree_map(lambda a: a, v)
    stats = {"mean": jnp.array([0.3, -0.2, 1.0]),
             "var": jnp.array([1.5, 0.7, 2.0])}
    params = {"scale": jnp.array([1.1, 0.9, 1.3]),
              "bias": jnp.array([0.1, -0.1, 0.0])}
    y = fm.apply({"params": params, "batch_stats": stats}, x,
                 use_running_average=True)
    bn = nn.BatchNorm(use_running_average=True, epsilon=EPS,
                      dtype=jnp.float32)
    yr = bn.apply({"params": params, "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               rtol=1e-5, atol=1e-6)
