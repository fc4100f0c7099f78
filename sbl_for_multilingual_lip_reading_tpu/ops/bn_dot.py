"""Train-mode BatchNorm whose statistics ride the MXU as dot products.

Motivation (round-4 production trace, tools/train_trace_probe.py +
trace_agg @B=240, decoder unroll=2, 407.9 ms/iter busy): the frontend's
BatchNorm stat/grad reductions bill ~66 ms/iter as `convert_reduce`
fusions -- f32[64] 30.4 ms(!), f32[128] 12.8, f32[256] 11.7, f32[512]
10.7 -- roughly 3x over their HBM-bandwidth floor.  Root cause matches
the round-3 Pallas-BN post-mortem: XLA's trunk convs emit lanes=N
layouts, so a reduce over (N, H, W) is a reduce across the *lane*
dimension, which the VPU does with slow cross-lane shuffles.  The
round-3 fix attempt (a one-pass Pallas kernel, ops/batchnorm.py) lost
anyway because Mosaic custom calls pin their operands to the default
layout and every conv-output consumer paid a whole-tensor relayout copy.

This module takes the third route: keep everything inside XLA (no
layout pin) but express every reduction as a `dot_general`, which the
TPU backend maps onto the MXU -- a contraction over the lane dimension
is exactly what the systolic array is built for, and layout assignment
can propagate the dot's preferred layout back into the conv epilogue
instead of inserting a copy.

Formulation (per BN group; all reductions over the M = N*H*W positions):

  forward   s1   = ones_M . x                      (dot, bf16 in / f32 acc)
            gram = x^T . x  -> s2 = diag(gram)     (dot; the off-diagonal
                   FLOPs are free -- stage-1's full gram is 28 GFLOP vs
                   the 274 GFLOP conv it follows -- and using the gram
                   avoids materializing an x*x operand)
            mean = s1/M, var = s2/M - mean^2, y = (x-mean)*inv*scale+bias
  backward  g_bias  = ones_M . dy                  (dot)
            sxdy    = diag(dy^T . x)               (dot)
            g_scale = inv * (sxdy - mean * g_bias)
            dx = scale*inv*(dy - g_bias/M - xhat*g_scale/M)   (elementwise)

Numerics: bf16 x bf16 products are exact in f32 (8-bit mantissas), and
the MXU accumulates in f32, so s1/s2 match flax's convert-to-f32
`mean(x)`/`mean(x^2)` reductions up to summation order.  var uses the
same E[x^2]-E[x]^2 form as `nn.BatchNorm(use_fast_variance=True)` and
the gradient identities above are the standard BN VJP, so this is a
drop-in for both `nn.BatchNorm` (groups=1) and the DataParallel-parity
`GroupedBatchNorm` (groups=dp) in models/frontend.py.

Reference semantics reproduced: torch BatchNorm2d/3d train mode
(reference SBL_Multilingual_Lip_reading/transformer/video_frontend.py:
15-41, 90-135), biased running-var update matching the repo's existing
BN modules.

The returned (mean, var) feed the module's running-stat update only and
are stop-gradiented there; their cotangents are ignored in the VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _group_view(x: Array, groups: int) -> Array:
    """(N, ..., C) -> (g, N/g, ..., C); groups=1 returns x unchanged (the
    production single-chip path stays 4-D -- XLA's 5-D layouts tile-pad,
    see the round-1 NDHWC pool note in models/frontend.py)."""
    if groups == 1:
        return x
    N = x.shape[0]
    assert N % groups == 0, f"batch {N} not divisible by {groups} BN groups"
    return x.reshape((groups, N // groups) + x.shape[1:])


def _stats(xg: Array, yg: Array, groups: int) -> tuple[Array, Array, int]:
    """(sum yg, diag(yg^T xg), M) with all reductions as MXU dots.

    xg/yg: group views from ``_group_view`` (may alias).  Returns f32
    (g, C) sums over every non-group, non-channel dim.
    """
    nb = 0 if groups == 1 else 1
    red = tuple(range(nb, xg.ndim - 1))
    M = 1
    for d in red:
        M *= xg.shape[d]
    batch = ((), ()) if groups == 1 else ((0,), (0,))
    ones = jnp.ones(yg.shape[:-1], yg.dtype)
    s1 = jax.lax.dot_general(
        ones, yg, ((red, red), batch),
        preferred_element_type=jnp.float32)                      # ([g,] C)
    # gram in x's (compute) dtype: f32 operands would run the MXU at the
    # ~1/8 f32 pass rate.  bf16 is exact here -- bf16 x bf16 products are
    # exact in the f32 accumulator, and the backward's dy cotangent enters
    # through the module's output->bf16 cast boundary so its values are
    # bf16-representable (the cast below is lossless).
    f32 = jnp.float32
    gram = jax.lax.dot_general(
        yg.astype(xg.dtype), xg, ((red, red), batch),
        preferred_element_type=f32)                              # ([g,] C, C)
    s2 = jnp.diagonal(gram, axis1=-2, axis2=-1)                  # ([g,] C)
    if groups == 1:
        s1, s2 = s1[None], s2[None]
    return s1.astype(f32), s2, M


def _bshape(xg: Array, groups: int) -> tuple:
    """Broadcast shape for (g, C) stats against the group view of x."""
    if groups == 1:
        return (1,) * (xg.ndim - 1) + (xg.shape[-1],)
    return (xg.shape[0],) + (1,) * (xg.ndim - 2) + (xg.shape[-1],)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train_dot(x: Array, scale: Array, bias: Array, eps: float,
                 groups: int):
    """Train-mode grouped BN: returns (y_f32, mean (g,C), var (g,C))."""
    y, mean, var, _ = _fwd_impl(x, scale, bias, eps, groups)
    return y, mean, var


def _fwd_impl(x, scale, bias, eps, groups):
    xg = _group_view(x, groups)
    s1, s2, M = _stats(xg, xg, groups)
    mean = s1 / M
    var = s2 / M - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)                               # (g, C)
    bs = _bshape(xg, groups)
    mul = (inv * scale).reshape(bs)
    add = (bias - mean * inv * scale).reshape(bs)
    y = (xg.astype(jnp.float32) * mul + add).reshape(x.shape)
    return y, mean, var, inv


def _fwd(x, scale, bias, eps, groups):
    y, mean, var, inv = _fwd_impl(x, scale, bias, eps, groups)
    return (y, mean, var), (x, scale, mean, inv)


def _bwd(eps, groups, res, cts):
    x, scale, mean, inv = res
    dy, _, _ = cts            # mean/var cotangents: running stats only,
    #                           stop-gradiented by the module
    # dy -> compute dtype ONCE: every caller casts y to the compute dtype
    # immediately (directly or through a relu), so the f32 cotangent's
    # values are bf16-representable and this cast is lossless; it halves
    # the dy bytes every consumer below reads and keeps the stat dots on
    # the full-rate bf16 MXU path.
    dyg = _group_view(dy.astype(x.dtype), groups)
    xg = _group_view(x, groups)
    g_bias, sxdy, M = _stats(xg, dyg, groups)
    g_scale = inv * (sxdy - mean * g_bias)                       # (g, C)
    bs = _bshape(xg, groups)
    si = scale * inv
    # dx = scale*inv*(dy - g_bias/M - xhat*g_scale/M), xhat=(x-mean)*inv
    a = (si).reshape(bs)
    b = (si * (g_bias + (-mean * inv) * g_scale) / M).reshape(bs)
    c = (si * inv * g_scale / M).reshape(bs)
    dxg = dyg.astype(jnp.float32) * a - b - xg.astype(jnp.float32) * c
    dx = dxg.reshape(x.shape).astype(x.dtype)
    return dx, jnp.sum(g_scale, 0), jnp.sum(g_bias, 0)


bn_train_dot.defvjp(_fwd, _bwd)
