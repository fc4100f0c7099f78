"""Pallas train-mode BatchNorm: bandwidth-rate channel statistics.

The frontend's train-mode BatchNorms (reference video_frontend.py:111-158,
one per conv) compute per-channel mean/var forward and two more per-channel
reductions backward.  XLA emits those as standalone reduce fusions that run
3-15x over the HBM bandwidth floor at the frontend's shapes -- ~33 ms
forward + ~37 ms backward of the 425 ms B=240 train step (measured,
tools/trace_agg.py; the deep stages' small reductions are the furthest over
floor).  This module reimplements train-mode BN as a ``jax.custom_vjp``
around two one-pass Pallas reduction kernels:

* forward: ``channel_sums`` reads x once and produces (sum_x, sum_x2);
  the normalize itself stays an XLA elementwise op (it fuses).
* backward: ``channel_sums_pair`` reads (dy, x) once and produces
  (sum_dy, sum_dy_xhat), which are exactly d_bias and d_scale; dx is then
  a closed-form elementwise expression (fuses into the conv backward).

VERDICT (2026-08-18, default OFF): a net LOSS end-to-end -- device busy
782.7 vs 656.8 ms/iter on the B=240 train step (tools/train_trace_probe.py
+ trace_agg).  The removed XLA reductions (~45 ms) are more than repaid by
+73 ms of whole-tensor relayout copies: XLA's trunk convs emit lanes=N
layouts and Mosaic custom calls only accept the default layout, so every
Pallas consumer of a conv output forces a copy (the same wall the fused
resblock kernel hit, ops/resblock.py).  The kernels themselves also ran
~3x over the bandwidth floor at C=64: the lane pad to 128 wastes half of
VMEM and the batch-block divisibility constraint shrinks blocks to ~2 MB
(870+ sequential grid steps per call).  Kept with tests as the measured
experiment; PALLAS_BN=1 re-enables for probes (models/frontend.py).

Numerics match ``nn.BatchNorm(dtype=f32)`` + cast: statistics and the
normalize run in float32 regardless of input dtype, variance is the biased
``E[x^2] - E[x]^2`` (flax semantics), and the output casts back to the
input dtype.  The custom backward also honors cotangents arriving on the
returned (mean, var) so it stays correct if stats are ever differentiated
(they normally only feed the non-differentiated running-stat update).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import available

Array = jnp.ndarray


def _batch_block(n: int, hw: int, c: int, itemsize: int,
                 budget_bytes: int) -> int:
    """Largest divisor of ``n`` whose (bn, hw, c) block fits ``budget_bytes``
    of VMEM as Mosaic actually allocates it: the minor dim pads to 128
    lanes, the second-minor to the dtype's sublane tile, and the pipeline
    double-buffers every grid-streamed input."""
    sub = max(1, 32 // itemsize)                  # (8,128) f32 / (16,128) bf16
    row = (-(-hw // sub) * sub) * (-(-c // 128) * 128) * itemsize
    for bn in (256, 192, 128, 96, 64, 48, 32, 24, 16, 12, 8, 6, 4, 3, 2, 1):
        if n % bn == 0 and bn * row * 2 <= budget_bytes:
            return bn
    return 1


def channel_sums(x: Array, interpret: Optional[bool] = None
                 ) -> Tuple[Array, Array]:
    """(N, HW, C) -> f32 (C,) sum and (C,) sum-of-squares, one pass."""
    N, HW, C = x.shape
    if interpret is None:
        interpret = not available()
    bn = _batch_block(N, HW, C, x.dtype.itemsize, budget_bytes=10 << 20)

    def kernel(x_ref, s_ref, q_ref):
        xb = x_ref[...].astype(jnp.float32)
        s = jnp.sum(xb, axis=(0, 1))[None]              # (1, C)
        q = jnp.sum(xb * xb, axis=(0, 1))[None]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            s_ref[...] = s
            q_ref[...] = q

        @pl.when(pl.program_id(0) != 0)
        def _acc():
            s_ref[...] += s
            q_ref[...] += q

    s, q = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)),
        grid=(N // bn,),
        in_specs=[pl.BlockSpec((bn, HW, C), lambda i: (i, 0, 0))],
        out_specs=(pl.BlockSpec((1, C), lambda i: (0, 0)),
                   pl.BlockSpec((1, C), lambda i: (0, 0))),
        interpret=interpret,
    )(x)
    return s[0], q[0]


def channel_sums_pair(dy: Array, x: Array, mean: Array, inv: Array,
                      interpret: Optional[bool] = None
                      ) -> Tuple[Array, Array]:
    """One pass over (dy, x): f32 (C,) sum(dy) and sum(dy * xhat) where
    xhat = (x - mean) * inv."""
    N, HW, C = x.shape
    if interpret is None:
        interpret = not available()
    # two grid-streamed inputs (dy, x) share the budget
    bn = _batch_block(N, HW, C, max(dy.dtype.itemsize, x.dtype.itemsize),
                      budget_bytes=5 << 20)

    def kernel(dy_ref, x_ref, m_ref, i_ref, sd_ref, sx_ref):
        dyb = dy_ref[...].astype(jnp.float32)
        xb = x_ref[...].astype(jnp.float32)
        xhat = (xb - m_ref[0][None, None]) * i_ref[0][None, None]
        sd = jnp.sum(dyb, axis=(0, 1))[None]
        sx = jnp.sum(dyb * xhat, axis=(0, 1))[None]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            sd_ref[...] = sd
            sx_ref[...] = sx

        @pl.when(pl.program_id(0) != 0)
        def _acc():
            sd_ref[...] += sd
            sx_ref[...] += sx

    sd, sx = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, C), jnp.float32),
                   jax.ShapeDtypeStruct((1, C), jnp.float32)),
        grid=(N // bn,),
        in_specs=[pl.BlockSpec((bn, HW, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bn, HW, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, C), lambda i: (0, 0)),
                  pl.BlockSpec((1, C), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((1, C), lambda i: (0, 0)),
                   pl.BlockSpec((1, C), lambda i: (0, 0))),
        interpret=interpret,
    )(dy, x, mean[None], inv[None])
    return sd[0], sx[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train(x: Array, scale: Array, bias: Array, eps: float,
             interpret: Optional[bool] = None):
    """Train-mode BN over all but the last axis of ``x``.

    Returns (y, mean, var): y in x.dtype, stats in f32 (biased variance,
    flax semantics).
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, interpret)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, interpret):
    shape = x.shape
    C = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    x3 = x.reshape(shape[0], n // shape[0], C)
    s, q = channel_sums(x3, interpret)
    cnt = jnp.float32(n)
    mean = s / cnt
    var = q / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(jnp.float32)
    b = bias - mean * a
    y = (x.astype(jnp.float32) * a + b).astype(x.dtype)
    return y, mean, var, inv


def _bn_fwd(x, scale, bias, eps, interpret):
    y, mean, var, inv = _bn_fwd_impl(x, scale, bias, eps, interpret)
    return (y, mean, var), (x, scale, mean, inv)


def _bn_bwd(eps, interpret, res, cts):
    x, scale, mean, inv = res
    dy, dmean, dvar = cts
    shape = x.shape
    C = shape[-1]
    n = 1
    for d in shape[:-1]:
        n *= d
    cnt = jnp.float32(n)
    x3 = x.reshape(shape[0], n // shape[0], C)
    dy3 = dy.reshape(x3.shape)
    sum_dy, sum_dy_xhat = channel_sums_pair(dy3, x3, mean, inv, interpret)
    d_bias = sum_dy
    d_scale = sum_dy_xhat
    # dx = g1*(dy - sum_dy/n - xhat*sum_dy_xhat/n) + dmean/n
    #      + 2*dvar*(x - mean)/n            with g1 = inv*scale
    # expressed affinely in x:  dx = g1*dy + A*x + (B - A*mean)
    g1 = (inv * scale).astype(jnp.float32)
    A = -(g1 * inv * sum_dy_xhat) / cnt + 2.0 * dvar / cnt
    B = -(g1 * sum_dy) / cnt + dmean / cnt
    xf = x.astype(jnp.float32)
    dx = (g1 * dy.astype(jnp.float32) + A * xf + (B - A * mean)).astype(
        x.dtype)
    return dx, d_scale, d_bias


bn_train.defvjp(_bn_fwd, _bn_bwd)
