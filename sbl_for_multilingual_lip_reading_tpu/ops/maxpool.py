"""Max pool with a scatter-free TPU backward.

``nn.max_pool``'s VJP lowers to ``select_and_scatter`` -- a windowed
scan op XLA executes far off the vector units' bandwidth on TPU.  The
frontend's one pool (3x3, stride 2, pad 1 -- reference
video_frontend.py:97 MaxPool3d(k=(1,3,3)) with time folded into batch)
sits on the (B*T, 44, 44, 64) stem-conv output, so the training step
pays that op on a ~1.8 GB tensor every iteration.

This module keeps the forward as the plain ``reduce_window`` max and
replaces only the backward:

1. pack each element into an int32 ``(monotonic16(x) << 13) | (8191 -
   flat_hw_position)`` -- bf16/f16 bit patterns of non-negative floats
   compare monotonically as integers, and the sign-fold below extends
   that to negatives; the inverted position makes the ROW-MAJOR-FIRST
   maximum win ties, matching both torch's MaxPool2d backward and XLA's
   ``select_and_scatter`` (whose GE select also keeps the first hit);
2. one ``reduce_window`` max over the packed int32 recovers, per pool
   window, the winning input position;
3. the gradient routes with pure elementwise compares: with stride 2 a
   given input position lies in at most 4 windows, so each output-parity
   quadrant of dx is a 4-term sum of shifted ``dy * (pos_win == pos)``
   products -- slices and selects only, everything fuses.

No scatter, no Pallas (so no Mosaic layout pin on the conv output -- the
round-3 BN/resblock experiments showed any Pallas consumer of a trunk
conv costs a whole-tensor relayout copy), and ties resolve identically
to the select_and_scatter path (tested exactly in
tests/test_maxpool.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_POS_BITS = 13
_POS_MASK = (1 << _POS_BITS) - 1


def _monotonic_int(x: Array) -> Array:
    """Bit-fold a float tensor to int32 so integer compares match float
    compares (IEEE totally ordered, -0.0 < +0.0)."""
    if x.dtype not in (jnp.bfloat16, jnp.float16):
        # f32 would need >16 value bits to stay exact -- callers fall back
        # to the select_and_scatter path for anything but 16-bit floats
        raise TypeError(f"unsupported pool dtype {x.dtype}")
    bits = jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32)
    sign, full = 1 << 15, (1 << 16) - 1
    return jnp.where(bits >= sign, full - bits, bits | sign)


def _pool_fwd_raw(x: Array) -> Array:
    # -inf (not finfo.min) so an all--inf window reduces to -inf exactly
    # like nn.max_pool; bf16/f16 both represent inf.
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)
    return jax.lax.reduce_window(
        x, jnp.asarray(init, x.dtype), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


@jax.custom_vjp
def max_pool_3x3s2(x: Array) -> Array:
    """3x3 / stride-2 / pad-1 max pool over axes (1, 2) of a NHWC tensor
    (the frontend stem's only pooling shape)."""
    return _pool_fwd_raw(x)


def _fwd(x):
    return _pool_fwd_raw(x), x


def _bwd(x, dy):
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0 and H * W <= _POS_MASK, (H, W)
    pos = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32))[None, :, :, None]
    packed = ((_monotonic_int(x) << _POS_BITS)
              | (_POS_MASK - pos))
    pw = jax.lax.reduce_window(
        packed, jnp.iinfo(jnp.int32).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    pos_win = _POS_MASK - (pw & _POS_MASK)            # (N, Ho, Wo, C)

    # ring-pad the window grid so candidate indexing never clips; padded
    # windows carry pos -1 (matches nothing) and dy 0
    pos_p = jnp.pad(pos_win, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-1)
    dy_p = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # input h is covered by windows wh in {(h-1)//2, (h-1)//2 + 1}; in the
    # padded grid (index wh+1) that is {m+eh, m+eh+1} for h = 2m+eh.  dx
    # assembles from 2x2 parity quadrants, each a 4-candidate sum.
    Hh, Wh = H // 2, W // 2
    quads = []
    for eh in (0, 1):
        row = []
        for ew in (0, 1):
            # flat positions of inputs (2m+eh, 2n+ew), shape (1,Hh,Wh,1)
            p_in = ((jnp.arange(Hh, dtype=jnp.int32) * 2 + eh)[:, None] * W
                    + (jnp.arange(Wh, dtype=jnp.int32) * 2 + ew))[None, :, :,
                                                                  None]
            # a position can win up to 4 windows; sum its dy's in f32
            # (select_and_scatter_add accumulates pre-cast too)
            acc = jnp.zeros((N, Hh, Wh, C), jnp.float32)
            for ch in (0, 1):
                for cw in (0, 1):
                    hs, ws = eh + ch, ew + cw
                    pv = jax.lax.slice(
                        pos_p, (0, hs, ws, 0), (N, hs + Hh, ws + Wh, C))
                    dv = jax.lax.slice(
                        dy_p, (0, hs, ws, 0), (N, hs + Hh, ws + Wh, C))
                    acc = acc + jnp.where(pv == p_in,
                                          dv.astype(jnp.float32), 0.0)
            row.append(acc.astype(dy.dtype))
        quads.append(row)
    # interleave quadrants back to (N, H, W, C): axes (N, m, eh, n, ew, C)
    dx = jnp.stack([jnp.stack(r, axis=3) for r in quads], axis=2)
    dx = dx.reshape(N, H, W, C)
    return (dx,)


max_pool_3x3s2.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------- v2
# One-window variant: the packed argmax reduce_window runs in the FORWARD
# (replacing the plain bf16 max window -- the pooled values are recovered
# from the packed winner's value bits, bit-identical), and the residual is
# the (N, Ho, Wo, C) uint16 winner positions instead of x.  The backward
# then skips the repack + second reduce_window entirely (the round-4
# unroll-2 production trace bills that recompute ~13-18 ms/iter @B=240:
# and_subtract_fusion 5.0 + maximum_convert_fusion 8.3 + part of the
# bf16[7200,22,22,64] fusions).  Residual cost: 222 MB of uint16 vs the
# 1.78 GB bf16 x the v1 backward re-reads.


def _unpack_value(pw: Array, dtype) -> Array:
    """Invert ``_monotonic_int`` on the value bits of a packed winner."""
    bits = (pw >> _POS_BITS).astype(jnp.int32)
    sign, full = 1 << 15, (1 << 16) - 1
    raw = jnp.where(bits >= sign, bits & (sign - 1), full - bits)
    return jax.lax.bitcast_convert_type(raw.astype(jnp.uint16), dtype)


@jax.custom_vjp
def max_pool_3x3s2_v2(x: Array) -> Array:
    return _pool_fwd_raw(x)


def _fwd_v2(x):
    N, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0 and H * W <= _POS_MASK, (H, W)
    pos = (jnp.arange(H, dtype=jnp.int32)[:, None] * W
           + jnp.arange(W, dtype=jnp.int32))[None, :, :, None]
    packed = (_monotonic_int(x) << _POS_BITS) | (_POS_MASK - pos)
    pw = jax.lax.reduce_window(
        packed, jnp.iinfo(jnp.int32).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = _unpack_value(pw, x.dtype)
    pos_win = (_POS_MASK - (pw & _POS_MASK)).astype(jnp.uint16)
    return y, (pos_win, x.shape)


def _bwd_v2(res, dy):
    pos_win16, (N, H, W, C) = res
    pos_win = pos_win16.astype(jnp.int32)
    # identical quadrant assembly to v1's tail (see _bwd), minus the repack
    pos_p = jnp.pad(pos_win, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-1)
    dy_p = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Hh, Wh = H // 2, W // 2
    quads = []
    for eh in (0, 1):
        row = []
        for ew in (0, 1):
            p_in = ((jnp.arange(Hh, dtype=jnp.int32) * 2 + eh)[:, None] * W
                    + (jnp.arange(Wh, dtype=jnp.int32) * 2 + ew))[None, :, :,
                                                                  None]
            acc = jnp.zeros((N, Hh, Wh, C), jnp.float32)
            for ch in (0, 1):
                for cw in (0, 1):
                    hs, ws = eh + ch, ew + cw
                    pv = jax.lax.slice(
                        pos_p, (0, hs, ws, 0), (N, hs + Hh, ws + Wh, C))
                    dv = jax.lax.slice(
                        dy_p, (0, hs, ws, 0), (N, hs + Hh, ws + Wh, C))
                    acc = acc + jnp.where(pv == p_in,
                                          dv.astype(jnp.float32), 0.0)
            row.append(acc.astype(dy.dtype))
        quads.append(row)
    dx = jnp.stack([jnp.stack(r, axis=3) for r in quads], axis=2)
    dx = dx.reshape(N, H, W, C)
    return (dx,)


max_pool_3x3s2_v2.defvjp(_fwd_v2, _bwd_v2)


def stem_max_pool(x: Array) -> Array:
    """The frontend stem's 3x3/s2/p1 pool, with the scatter-free backward
    when the shape/dtype qualify (bf16/f16, even H/W, H*W < 2^13 -- always
    true at production dims) and the ``select_and_scatter`` fallback
    otherwise.  Forward results are identical either way."""
    import os

    from flax import linen as nn
    N, H, W, C = x.shape
    eligible = (x.dtype in (jnp.bfloat16, jnp.float16)
                and H % 2 == 0 and W % 2 == 0 and H * W <= _POS_MASK
                and not os.environ.get("NO_FAST_POOL_GRAD"))
    if eligible:
        # v2 (packed-window forward, uint16 position residuals) is the
        # default after the round-4 A/B (438.5 vs 441.6/444.7 ms/iter
        # baseline bracket on the anchored B=240 prod step -- ~0.7%,
        # consistent with the trace's ~3 ms quadrant-repack saving).
        if os.environ.get("NO_FAST_POOL_V2"):
            return max_pool_3x3s2(x)
        return max_pool_3x3s2_v2(x)
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))
