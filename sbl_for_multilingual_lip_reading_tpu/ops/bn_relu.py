"""Fused train-mode BatchNorm(+residual)+ReLU with minimal backward residuals.

Reference semantics: torch ``BatchNorm2d`` in train mode followed by the
BasicBlock's ReLU / residual-add-ReLU (video_frontend.py:15-41) and the stem
BN+ReLU (video_frontend.py:95-97), including the DataParallel per-replica
statistics variant (``groups`` > 1, see models/frontend.GroupedBatchNorm).

Why this exists (round-4 frontend-backward campaign): under plain JAX
autodiff every BN->ReLU pair stores TWO full-size residuals for the
backward -- the conv output (for the BN backward) *and* the BN output (the
ReLU VJP's saved input).  At B=240 production dims that second copy is
~5 GB of pure waste across the stem + 8 BasicBlocks: the ReLU mask is
derivable from the conv output and the 64-2048 floats of batch statistics.
XLA's HLO rematerialization pass already fights this at the HBM edge by
cloning the BN stat reductions into the backward (the ``.remat`` /
``.remat_uncompressed`` fusions billing ~20 ms/iter in the round-4
production trace) -- paying full re-reductions because it clones
instructions, it cannot "stash the 64 floats".

This op makes the minimal-residual schedule explicit with a custom VJP:

  forward   y = relu(cast(gamma * xhat + beta) [+ res]),  saves (x, res,
            mean, rstd) -- x is needed by the BN backward regardless, the
            stats are (groups, C) f32 scalars;
  backward  recomputes xhat and the ReLU mask from x + stats (elementwise,
            fuses into the two stat-gradient passes XLA must run anyway)
            and emits dx as one fusable elementwise expression.

Pure XLA -- no Pallas, so none of the Mosaic relayout tax that sank the
round-3 ``ops/batchnorm.py`` kernel and the round-4 ``ops/bn_dot.py``
experiment on the conv trunk; the stat reductions themselves stay XLA's
fused convert_reduce epilogues (measured at the HBM roofline, CLAUDE.md
round-4 dot-BN verdict).  What changes is only what the backward *stores*.

Stats cotangents: the (mean, var) outputs exist solely for the module's
running-average buffers, which the caller must ``stop_gradient`` (both
GroupedBatchNorm semantics and torch never backprop running stats), so the
VJP ignores their cotangents.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _group_stats(xf: Array, groups: int, eps: float):
    """Per-group batch statistics over all but the channel dim.

    xf: (N, ..., C) f32.  Returns (xg, mean, rstd, var) with xg of shape
    (g, N//g, ..., C) and mean/rstd/var (g, C) f32.
    """
    N = xf.shape[0]
    xg = xf.reshape((groups, N // groups) + xf.shape[1:])
    axes = tuple(range(1, xg.ndim - 1))
    mean = jnp.mean(xg, axes)
    var = jnp.mean(jnp.square(xg), axes) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    return xg, mean, rstd, var


def _bshape(g: int, ndim_g: int, C: int) -> Tuple[int, ...]:
    return (g,) + (1,) * (ndim_g - 2) + (C,)


@functools.lru_cache(maxsize=None)
def _make(eps: float, groups: int, relu: bool, with_res: bool):
    """Build the custom-VJP fused op for a static (eps, groups, relu,
    with_res) configuration."""

    def _forward(x, scale, bias, res):
        xf = x.astype(jnp.float32)
        xg, mean, rstd, var = _group_stats(xf, groups, eps)
        bs = _bshape(groups, xg.ndim, x.shape[-1])
        z = (xg - mean.reshape(bs)) * (rstd.reshape(bs)
                                       * scale.reshape(bs[1:])) \
            + bias.reshape(bs[1:])
        zc = z.reshape(x.shape).astype(x.dtype)
        if with_res:
            zc = zc + res.astype(x.dtype)
        y = jax.nn.relu(zc) if relu else zc
        return y, mean, var, rstd

    def f(x, scale, bias, res):
        y, mean, var, _ = _forward(x, scale, bias, res)
        return y, mean, var

    @jax.custom_vjp
    def op(x, scale, bias, res):
        return f(x, scale, bias, res)

    def fwd(x, scale, bias, res):
        y, mean, var, rstd = _forward(x, scale, bias, res)
        return (y, mean, var), (x, res, mean, rstd, scale, bias)

    def bwd(saved, cots):
        # cots for the (mean, var) outputs are zero by contract (running
        # buffers are stop_gradient'ed by the caller) -- ignored.
        dy = cots[0]
        x, res, mean, rstd, scale, bias = saved
        C = x.shape[-1]
        xf = x.astype(jnp.float32)
        xg = xf.reshape((groups, x.shape[0] // groups) + x.shape[1:])
        bs = _bshape(groups, xg.ndim, C)
        xhat = (xg - mean.reshape(bs)) * rstd.reshape(bs)
        if relu:
            # recompute the forward's post-cast pre-relu value for the mask
            z = (xhat * scale.reshape(bs[1:])
                 + bias.reshape(bs[1:])).astype(x.dtype)
            zc = z.reshape(x.shape)
            if with_res:
                zc = zc + res.astype(x.dtype)
            mask = zc > 0
            g = jnp.where(mask, dy, jnp.zeros((), dy.dtype))
        else:
            g = dy
        gf = g.astype(jnp.float32).reshape(xg.shape)
        axes = tuple(range(1, xg.ndim - 1))
        s1 = jnp.sum(gf, axes)                       # (g, C) = d_bias / grp
        s2 = jnp.sum(gf * xhat, axes)                # (g, C) = d_scale / grp
        M = gf.size // (groups * C)
        dxg = (rstd.reshape(bs) * scale.reshape(bs[1:])) * (
            gf - (s1.reshape(bs) + xhat * s2.reshape(bs)) / M)
        dx = dxg.reshape(x.shape).astype(x.dtype)
        dscale = jnp.sum(s2, 0)
        dbias = jnp.sum(s1, 0)
        dres = g.astype(res.dtype) if with_res else jnp.zeros_like(res)
        return dx, dscale, dbias, dres

    op.defvjp(fwd, bwd)
    return op


def bn_act_train(x: Array, scale: Array, bias: Array,
                 res: Optional[Array] = None, *, eps: float = 1e-5,
                 groups: int = 1, relu: bool = True):
    """Fused train-mode BatchNorm (+ residual add) (+ ReLU).

    x:      (N, ..., C) activations (any float dtype; statistics in f32).
    res:    optional residual added *after* the normalize (in x.dtype, i.e.
            the BasicBlock's ``relu(bn2(h) + residual)`` tail).
    groups: per-replica (DataParallel-parity) statistic groups over
            contiguous leading-dim slices; must divide N.

    Returns ``(y, mean, var)`` -- y in x.dtype, mean/var (groups, C) f32
    (biased variance, matching GroupedBatchNorm / flax running updates).
    The custom VJP stores only (x, res, stats): the ReLU mask and xhat are
    recomputed from them, eliminating the BN-output residual that the
    composed autodiff keeps alive.
    """
    N, C = x.shape[0], x.shape[-1]
    assert N % groups == 0, f"batch {N} not divisible by {groups} BN groups"
    assert scale.shape == (C,) and bias.shape == (C,)
    op = _make(float(eps), int(groups), bool(relu), res is not None)
    if res is None:
        # pass a dummy scalar so the custom_vjp arity is static
        return op(x, scale.astype(jnp.float32), bias.astype(jnp.float32),
                  jnp.zeros((), x.dtype))
    return op(x, scale.astype(jnp.float32), bias.astype(jnp.float32), res)
