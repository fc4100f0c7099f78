"""Pallas fused multi-head attention kernel (TPU).

The reference's attention materializes the (B*H, T, T) score tensor in HBM
through separate bmm/softmax/bmm kernel launches
(SBL_Multilingual_Lip_reading/transformer/attention.py:63-83).  This kernel
fuses QK^T -> bias/mask -> softmax -> PV in VMEM: for this model's sequence
lengths (<=31 video frames, <=17 decode tokens) the whole (T, d) tile of one
(batch, head) pair fits comfortably in VMEM, so a single-block formulation is
optimal -- no K/V streaming loop needed (flash-attention tiling only pays off
for T in the thousands).

Layout: q/k/v are (B, H, T, d); grid is (B, H); each program computes one
head's full attention with fp32 accumulation on the MXU.  An optional
additive bias (B, 1|H, Tq, Tk) carries padding/causal masks (use -1e9 for
disallowed pairs, matching ops/masks conventions).

Falls back to interpreter mode off-TPU (tests) -- use
``attention.available()`` to gate production use.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def available() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _attend(q, k, v, bias, scale, out_dtype):
    """(Tq,d),(Tk,d),(Tk,d)[,(Tq,Tk)] -> (Tq,d), fp32 accumulation."""
    s = jax.lax.dot_general(q.astype(jnp.float32), k.astype(jnp.float32),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.dot(p, v.astype(jnp.float32),
                   preferred_element_type=jnp.float32).astype(out_dtype)


def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              scale: Optional[float] = None,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """q/k/v: (B, H, T, d) -> (B, H, Tq, d).

    bias: optional additive (B, H|1, Tq, Tk) float; use -1e9 to mask.
    """
    B, H, Tq, d = q.shape
    Tk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    if interpret is None:
        interpret = not available()
    out_dtype = q.dtype

    if bias is None:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            o_ref[0, 0] = _attend(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                                  None, scale, o_ref.dtype)
        in_specs = [
            pl.BlockSpec((1, 1, Tq, d), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tk, d), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tk, d), lambda b, h: (b, h, 0, 0)),
        ]
        args = (q, k, v)
    else:
        bias_h = bias.shape[1]
        bias_map = ((lambda b, h: (b, h, 0, 0)) if bias_h == H
                    else (lambda b, h: (b, 0, 0, 0)))

        def kernel(q_ref, k_ref, v_ref, b_ref, o_ref):
            o_ref[0, 0] = _attend(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                                  b_ref[0, 0], scale, o_ref.dtype)
        in_specs = [
            pl.BlockSpec((1, 1, Tq, d), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tk, d), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tk, d), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Tq, Tk), bias_map),
        ]
        args = (q, k, v, bias)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, d), out_dtype),
        grid=(B, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Tq, d), lambda b, h: (b, h, 0, 0)),
        interpret=interpret,
    )(*args)


def _small_mha_bwd_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, Bt, H,
                          has_bias):
    """Backward for the small-T fused attention (recompute p in VMEM).

    With out = softmax(q k^T s + b) v and g = do:
      dv = p^T g;  dp = g v^T;  ds = p * (dp - rowsum(dp * p));
      dq = ds k * s;  dk = ds^T q * s.
    """
    Tq = q_ref.shape[1]
    Tk = k_ref.shape[1]
    d = q_ref.shape[3]
    q = jnp.transpose(q_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tq, d)
    k = jnp.transpose(k_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tk, d)
    v = jnp.transpose(v_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tk, d)
    g = jnp.transpose(do_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tq, d)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if has_bias:
        b = b_ref[...].astype(jnp.float32)
        s = (s.reshape(Bt, H, Tq, Tk) + b[:, None]).reshape(Bt * H, Tq, Tk)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    # dp = g @ v^T
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    # dk = ds^T @ q : contract Tq
    dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dv = jax.lax.dot_general(p, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    def unfold(x, T):
        return jnp.transpose(x.reshape(Bt, H, T, d), (0, 2, 1, 3))

    dq_ref[...] = unfold(dq, Tq).astype(dq_ref.dtype)
    dk_ref[...] = unfold(dk, Tk).astype(dk_ref.dtype)
    dv_ref[...] = unfold(dv, Tk).astype(dv_ref.dtype)


def _small_mha_bwd(qh, kh, vh, bias, scale, do, interpret):
    B, Tq, H, d = qh.shape
    Tk = kh.shape[1]
    # the backward holds ~3x the forward's live tensors (q/k/v/do in, three
    # grads out, fp32 recompute); tile 16 overflowed the 16 MB scoped VMEM
    # by 0.6 MB at full dims, so cap at 8
    Bt = _pick_tile(B, cap=8)
    has_bias = bias is not None
    bias_b = bias.shape[0] if has_bias else 1
    import functools as _ft
    kernel = _ft.partial(_small_mha_bwd_kernel, scale=scale, Bt=Bt, H=H,
                         has_bias=has_bias)
    if not has_bias:
        def kernel_nb(q_ref, k_ref, v_ref, do_ref, dq, dk, dv):
            _small_mha_bwd_kernel(q_ref, k_ref, v_ref, None, do_ref,
                                  dq, dk, dv, scale=scale, Bt=Bt, H=H,
                                  has_bias=False)
        kernel = kernel_nb
    in_specs = [
        pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
    ]
    args = [qh, kh, vh]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)
    in_specs.append(pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)))
    args.append(do)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Tq, H, d), qh.dtype),
                   jax.ShapeDtypeStruct((B, Tk, H, d), kh.dtype),
                   jax.ShapeDtypeStruct((B, Tk, H, d), vh.dtype)),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0))),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


import functools as _functools


# ---------------------------------------------------------------------------
# Training kernel with in-kernel attention-prob dropout.
#
# The dropout mask is regenerated in the backward pass from the same seed
# (counter-based pltpu PRNG seeded per grid program), so nothing besides
# q/k/v/bias needs saving -- which also makes it compatible with the decoder
# scan's rematerialization.  Forward and backward MUST use the same batch
# tile so per-program mask generation lines up (_TRAIN_TILE).
#
# SBL_TRAIN_TILE overrides the tile cap (read once at import) for A/B
# measurement: larger tiles mean fewer grid programs per dispatch (the
# decoder issues 16 steps x 6 layers x 2 attns of tiny-T kernels, so
# per-program overhead is a real cost) at the price of more scoped VMEM
# per program.  Round-5 on-chip sweep on the B=240 prod train step
# (tools/tpu_batch5.sh): tile 8 = 415.7 ms/iter (base bracket mean),
# 16 = 411.6, 32 = 411.4 -- the win saturates at 16, so 16 is the
# default (lower VMEM headroom risk than 32 for the dropout kernels'
# regenerated masks).
# ---------------------------------------------------------------------------
_TRAIN_TILE = int(os.environ.get("SBL_TRAIN_TILE", "16"))

# SBL_ATTN_BF16_OPS=1: keep the FLAT train kernels' dot OPERANDS (and the
# in-VMEM head folds) in bf16 instead of upcasting everything to f32 at
# fold time.  Softmax/dropout/ds stay f32 (accumulators are f32 via
# preferred_element_type).  Numerics note: at default matmul precision the
# MXU rounds dot operands to bf16 anyway (proven by the round-5 on-chip
# causal-bias finding), so this mostly halves the VMEM fold/move bytes
# rather than changing results.  Read once at import for A/B measurement.
# MEASURED NO-WIN on chip (round 5, tools/tpu_batch5.sh): 414.1 ms/iter
# vs 415.7 base bracket on the B=240 prod step (within the 1.7 ms base
# spread); combined with GRAD_ACCUM_BF16 it read 417.5 (slightly
# negative).  The in-VMEM fold bytes are not the attention customs'
# cost; kept as a recorded experiment, default OFF.
_BF16_OPS = bool(int(os.environ.get("SBL_ATTN_BF16_OPS", "0")))
_OPERAND_DT = jnp.bfloat16 if _BF16_OPS else jnp.float32


def _seed_tile(seed) -> jnp.ndarray:
    """Broadcast a scalar/(1,) int32 seed into an (8, 128) VMEM tile.  A
    scalar SMEM input cannot be batched by pallas's vmap rule (the decoder
    direction-vmaps these kernels); a full (8, 128) tile can."""
    s0 = jnp.asarray(seed, jnp.int32).reshape(-1)[0]
    return jnp.full((8, 128), s0, jnp.int32)


def _dropout_keep(shape, rate: float):
    from jax.experimental.pallas import tpu as _pltpu
    bits = _pltpu.prng_random_bits(shape)
    bits = _pltpu.bitcast(bits, jnp.uint32)
    thresh = np.uint32(min(max(rate, 0.0), 1.0) * 4294967296.0)
    return bits >= thresh


def _attend_train(q_ref, k_ref, v_ref, b_ref, seed_ref, scale, rate, Bt, H,
                  has_bias):
    """Shared fwd/bwd recompute: returns (q, k, v, p_dropped, p) folded to a
    single (Bt*H, ...) batch axis, all fp32."""
    from jax.experimental.pallas import tpu as _pltpu
    Tq = q_ref.shape[1]
    Tk = k_ref.shape[1]
    d = q_ref.shape[3]
    q = jnp.transpose(q_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tq, d)
    k = jnp.transpose(k_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tk, d)
    v = jnp.transpose(v_ref[...].astype(jnp.float32),
                      (0, 2, 1, 3)).reshape(Bt * H, Tk, d)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if has_bias:
        b = b_ref[...].astype(jnp.float32)
        s = (s.reshape(Bt, H, Tq, Tk) + b[:, None]).reshape(Bt * H, Tq, Tk)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    _pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    keep = _dropout_keep(p.shape, rate)
    p_drop = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
    return q, k, v, p_drop, p, keep


def fused_small_mha_dropout_fwd(qh, kh, vh, bias, seed, scale, rate,
                                interpret=None):
    """Forward with attention-prob dropout; seed: (1,) int32."""
    B, Tq, H, d = qh.shape
    Tk = kh.shape[1]
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=_TRAIN_TILE)
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, seed_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, seed_ref, o_ref = refs
            b_ref = None
        _, _, v, p_drop, _, _ = _attend_train(
            q_ref, k_ref, v_ref, b_ref, seed_ref, scale, rate, Bt, H,
            has_bias)
        o = jax.lax.dot_general(p_drop, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[...] = jnp.transpose(o.reshape(Bt, H, Tq, d),
                                   (0, 2, 1, 3)).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
    ]
    args = [qh, kh, vh]
    if has_bias:
        bias_b = bias.shape[0]
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)
    in_specs.append(pl.BlockSpec((8, 128), lambda i: (0, 0)))
    args.append(_seed_tile(seed))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tq, H, d), qh.dtype),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(*args)


def fused_small_mha_dropout_bwd(qh, kh, vh, bias, seed, scale, rate, do,
                                interpret=None):
    B, Tq, H, d = qh.shape
    Tk = kh.shape[1]
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=_TRAIN_TILE)
    has_bias = bias is not None
    inv = 1.0 / (1.0 - rate)

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, dq_ref, dk_ref, \
                dv_ref = refs
        else:
            q_ref, k_ref, v_ref, seed_ref, do_ref, dq_ref, dk_ref, \
                dv_ref = refs
            b_ref = None
        q, k, v, p_drop, p, keep = _attend_train(
            q_ref, k_ref, v_ref, b_ref, seed_ref, scale, rate, Bt, H,
            has_bias)
        g = jnp.transpose(do_ref[...].astype(jnp.float32),
                          (0, 2, 1, 3)).reshape(Bt * H, Tq, d)
        dv = jax.lax.dot_general(p_drop, g, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd, 0.0) * inv
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale

        def unfold(x, T):
            return jnp.transpose(x.reshape(Bt, H, T, d), (0, 2, 1, 3))
        dq_ref[...] = unfold(dq, Tq).astype(dq_ref.dtype)
        dk_ref[...] = unfold(dk, Tk).astype(dk_ref.dtype)
        dv_ref[...] = unfold(dv, Tk).astype(dv_ref.dtype)

    in_specs = [
        pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
    ]
    args = [qh, kh, vh]
    if has_bias:
        bias_b = bias.shape[0]
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)
    in_specs.append(pl.BlockSpec((8, 128), lambda i: (0, 0)))
    args.append(_seed_tile(seed))
    in_specs.append(pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)))
    args.append(do)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Tq, H, d), qh.dtype),
                   jax.ShapeDtypeStruct((B, Tk, H, d), kh.dtype),
                   jax.ShapeDtypeStruct((B, Tk, H, d), vh.dtype)),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0))),
        interpret=interpret,
    )(*args)


def dropout_keep_mask(B: int, Tq: int, Tk: int, H: int, seed, rate: float,
                      interpret=None) -> jnp.ndarray:
    """Debug/validation helper: materialize the exact keep mask the
    training kernels generate (same per-program seeding and draw shape).
    Returns (B, H, Tq, Tk) bool."""
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=_TRAIN_TILE)

    def kernel(seed_ref, o_ref):
        from jax.experimental.pallas import tpu as _pltpu
        _pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        keep = _dropout_keep((Bt * H, Tq, Tk), rate)
        o_ref[...] = keep.reshape(Bt, H, Tq, Tk)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Tk), jnp.bool_),
        grid=(B // Bt,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((Bt, H, Tq, Tk), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(_seed_tile(seed))
    return out


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def small_mha_dropout_grad(qh, kh, vh, bias, seed, scale, rate):
    """Differentiable fused attention WITH attention-prob dropout.

    seed: (1,) int32 (fold in the step/layer so masks differ per call);
    scale/rate static floats.  The mask regenerates identically in the
    backward kernel, so remat-safe and O(1) residual memory."""
    return fused_small_mha_dropout_fwd(qh, kh, vh, bias, seed, scale, rate)


def _small_mha_drop_fwd(qh, kh, vh, bias, seed, scale, rate):
    out = fused_small_mha_dropout_fwd(qh, kh, vh, bias, seed, scale, rate)
    return out, (qh, kh, vh, bias, seed)


def _small_mha_drop_vjp(scale, rate, res, do):
    qh, kh, vh, bias, seed = res
    dq, dk, dv = fused_small_mha_dropout_bwd(qh, kh, vh, bias, seed, scale,
                                             rate, do)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias, jnp.zeros_like(seed)


small_mha_dropout_grad.defvjp(_small_mha_drop_fwd, _small_mha_drop_vjp)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def small_mha_grad(qh, kh, vh, bias, scale):
    """Differentiable fused small-T attention (no attention-prob dropout).
    bias may be None and receives a zero cotangent (it only carries
    constant masks); ``scale`` must be a static python float."""
    return fused_small_mha(qh, kh, vh, bias=bias, scale=scale)


def _small_mha_fwd(qh, kh, vh, bias, scale):
    out = fused_small_mha(qh, kh, vh, bias=bias, scale=scale)
    return out, (qh, kh, vh, bias)


def _small_mha_vjp(scale, res, do):
    qh, kh, vh, bias = res
    dq, dk, dv = _small_mha_bwd(qh, kh, vh, bias, scale, do,
                                interpret=not available())
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias


small_mha_grad.defvjp(_small_mha_fwd, _small_mha_vjp)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Boolean mask (True = disallowed), broadcastable to (B, Tq, Tk) ->
    additive bias (B, 1, Tq, Tk)."""
    return jnp.where(mask, -1e9, 0.0).astype(dtype)[:, None, :, :]


def _pick_tile(b: int, cap: int = 32) -> int:
    for t in (cap, 16, 8, 4, 2, 1):
        if t <= b and b % t == 0:
            return t
    return 1


def fused_small_mha(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention for SHORT sequences in the projections' natural
    (B, T, H, d) layout -- the shape this model's decode actually produces.

    XLA's path materializes the (B, H, Tq, Tk) score tensor in HBM where the
    tiny Tq/Tk dims tile-pad ~7x, and inserts (B,T,H,d)->(B,H,T,d)
    transposes around every einsum; for the SBL decode (T<=17, 16 steps x
    12 layers) that padding traffic dominates the whole step.  This kernel
    keeps scores entirely in VMEM, uses batched ``dot_general`` over the
    (tile, head) dims, and reads/writes only the unpadded (B, T, H, d)
    tensors.

    bias: optional additive (1|B, Tq, Tk) float (broadcast over heads).
    """
    B, Tq, H, d = qh.shape
    Tk = kh.shape[1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B)
    out_dtype = qh.dtype
    has_bias = bias is not None
    bias_b = bias.shape[0] if has_bias else 1

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        q = q_ref[...].astype(jnp.float32)      # (Bt, Tq, H, d)
        k = k_ref[...].astype(jnp.float32)      # (Bt, Tk, H, d)
        v = v_ref[...].astype(jnp.float32)
        # Mosaic matmul supports a single batch dim: fold (tile, head)
        # into one axis with VMEM-local transposes
        qf = jnp.transpose(q, (0, 2, 1, 3)).reshape(Bt * H, Tq, d)
        kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(Bt * H, Tk, d)
        vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(Bt * H, Tk, d)
        s = jax.lax.dot_general(
            qf, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (Bt*H, Tq, Tk)
        s = s * scale
        if has_bias:
            b = b_ref[...].astype(jnp.float32)   # (1|Bt, Tq, Tk)
            s = s.reshape(Bt, H, Tq, Tk) + b[:, None]
            s = s.reshape(Bt * H, Tq, Tk)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (Bt*H, Tq, d)
        o = jnp.transpose(o.reshape(Bt, H, Tq, d), (0, 2, 1, 3))
        o_ref[...] = o.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d), lambda i: (i, 0, 0, 0)),
    ]
    args = [qh, kh, vh]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tq, H, d), out_dtype),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bt, Tq, H, d), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(*args)


def fused_small_mha_flat(q2: jnp.ndarray, k2: jnp.ndarray, v2: jnp.ndarray,
                         n_head: int,
                         bias: Optional[jnp.ndarray] = None,
                         scale: Optional[float] = None,
                         interpret: Optional[bool] = None,
                         tile_cap: int = 16) -> jnp.ndarray:
    """Fused attention taking the projections' FLAT (B, T, H*d) layout.

    ``fused_small_mha`` wants (B, T, H, d), and the minor-dim 512 -> (8, 64)
    reshape XLA inserts to feed it is a physical relayout: the device trace
    showed ~8 ms/iter of bf16[2,256,L,8,64] copies around the decode's
    custom-calls @B=256.  This variant keeps the HBM interface flat on both
    sides and does the head split/merge in VMEM using only Mosaic-legal
    moves (64-wide minor slices + leading concats; minor-dim splits are
    rejected -- measured legality matrix in tools/mosaic_probe.py).

    bias: optional additive (1|B, Tq, Tk) float (broadcast over heads).
    """
    B, Tq, D = q2.shape
    Tk = k2.shape[1]
    H = n_head
    assert D % H == 0, (D, H)
    d = D // H
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=tile_cap)
    out_dtype = q2.dtype
    has_bias = bias is not None
    bias_b = bias.shape[0] if has_bias else 1

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs

        def heads(ref):
            # (Bt, T, D) -> (H*Bt, T, d), HEAD-major leading batch, in the
            # operand dtype (bf16 under SBL_ATTN_BF16_OPS)
            x = ref[...].astype(_OPERAND_DT)
            return jnp.concatenate(
                [x[:, :, h * d:(h + 1) * d] for h in range(H)], axis=0)

        qf, kf, vf = heads(q_ref), heads(k_ref), heads(v_ref)
        s = jax.lax.dot_general(
            qf, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale   # (H*Bt, Tq, Tk)
        if has_bias:
            b = b_ref[...].astype(jnp.float32)            # (1|Bt, Tq, Tk)
            if b.shape[0] == 1:
                s = s + jnp.broadcast_to(b, (H * Bt, Tq, Tk))
            else:
                # tile per-batch bias across the head-major leading axis
                # (leading concat is legal; reshaping s to split (H, Bt)
                # with a narrow (Tq, Tk) minor is not)
                s = s + jnp.concatenate([b] * H, axis=0)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(_OPERAND_DT), vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (H*Bt, Tq, d)
        o4 = o.reshape(H, Bt, Tq, d)
        o_ref[...] = jnp.concatenate(
            [o4[h] for h in range(H)], axis=-1).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
    ]
    args = [q2, k2, v2]
    if has_bias:
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), out_dtype),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# FLAT-layout training kernels (custom-VJP pair with optional in-kernel
# attention-prob dropout).
#
# The head-split (B,T,H,d) train kernels force XLA to materialize a
# 512 -> (8, 64) minor-dim relayout of every projection on the training
# path -- the exact copies fused_small_mha_flat was built to kill on the
# inference path.  These variants keep the HBM interface flat (B, T, H*d)
# on inputs, output AND gradients; the head split/merge happens in VMEM
# with Mosaic-legal moves (64-wide minor slices + leading concats).  The
# dropout mask regenerates in the backward from the same per-program seed
# (remat-safe, O(1) residuals); fwd and bwd MUST share _TRAIN_TILE.
# ---------------------------------------------------------------------------


def _heads_fold(ref, H, d):
    """(Bt, T, H*d) ref -> (H*Bt, T, d) head-major leading batch, in the
    operand dtype (f32, or bf16 under SBL_ATTN_BF16_OPS)."""
    x = ref[...].astype(_OPERAND_DT)
    return jnp.concatenate([x[:, :, h * d:(h + 1) * d] for h in range(H)],
                           axis=0)


def _heads_unfold(x, H, Bt, T, d):
    """(H*Bt, T, d) -> (Bt, T, H*d) via leading split + minor concat."""
    x4 = x.reshape(H, Bt, T, d)
    return jnp.concatenate([x4[h] for h in range(H)], axis=-1)


def _attend_train_flat(q_ref, k_ref, v_ref, b_ref, seed_ref, scale, rate,
                       Bt, H, has_bias):
    """Shared flat fwd/bwd recompute: returns (qf, kf, vf, p_drop, p, keep)
    head-major (H*Bt, ...) fp32.  rate=0 keeps everything (keep==True)."""
    from jax.experimental.pallas import tpu as _pltpu
    Tq = q_ref.shape[1]
    Tk = k_ref.shape[1]
    d = q_ref.shape[2] // H
    qf = _heads_fold(q_ref, H, d)
    kf = _heads_fold(k_ref, H, d)
    vf = _heads_fold(v_ref, H, d)
    s = jax.lax.dot_general(qf, kf, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if has_bias:
        b = b_ref[...].astype(jnp.float32)               # (1|Bt, Tq, Tk)
        if b.shape[0] == 1:
            s = s + jnp.broadcast_to(b, (H * Bt, Tq, Tk))
        else:
            s = s + jnp.concatenate([b] * H, axis=0)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if rate > 0.0:
        _pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        keep = _dropout_keep(p.shape, rate)
        p_drop = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - rate))
    else:
        keep = None
        p_drop = p
    return qf, kf, vf, p_drop, p, keep


def fused_small_mha_dropout_fwd_flat(q2, k2, v2, n_head, bias, seed, scale,
                                     rate, interpret=None):
    """Flat (B, T, H*d) forward with in-kernel attention-prob dropout."""
    B, Tq, D = q2.shape
    Tk = k2.shape[1]
    H = n_head
    d = D // H
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=_TRAIN_TILE)
    has_bias = bias is not None

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, seed_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, seed_ref, o_ref = refs
            b_ref = None
        _, _, vf, p_drop, _, _ = _attend_train_flat(
            q_ref, k_ref, v_ref, b_ref, seed_ref, scale, rate, Bt, H,
            has_bias)
        o = jax.lax.dot_general(p_drop.astype(_OPERAND_DT), vf,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[...] = _heads_unfold(o, H, Bt, Tq, d).astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
    ]
    args = [q2, k2, v2]
    if has_bias:
        bias_b = bias.shape[0]
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)
    in_specs.append(pl.BlockSpec((8, 128), lambda i: (0, 0)))
    args.append(_seed_tile(seed))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tq, D), q2.dtype),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*args)


def fused_small_mha_dropout_bwd_flat(q2, k2, v2, n_head, bias, seed, scale,
                                     rate, do, interpret=None):
    B, Tq, D = q2.shape
    Tk = k2.shape[1]
    H = n_head
    d = D // H
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=_TRAIN_TILE)
    has_bias = bias is not None
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, seed_ref, do_ref, dq_ref, dk_ref, \
                dv_ref = refs
        else:
            q_ref, k_ref, v_ref, seed_ref, do_ref, dq_ref, dk_ref, \
                dv_ref = refs
            b_ref = None
        qf, kf, vf, p_drop, p, keep = _attend_train_flat(
            q_ref, k_ref, v_ref, b_ref, seed_ref, scale, rate, Bt, H,
            has_bias)
        g = _heads_fold(do_ref, H, d)                    # (H*Bt, Tq, d)
        dv = jax.lax.dot_general(p_drop.astype(_OPERAND_DT), g,
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(g, vf, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dp = dpd if keep is None else jnp.where(keep, dpd, 0.0) * inv
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(_OPERAND_DT)
        dq = jax.lax.dot_general(dsc, kf, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(dsc, qf, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[...] = _heads_unfold(dq, H, Bt, Tq, d).astype(dq_ref.dtype)
        dk_ref[...] = _heads_unfold(dk, H, Bt, Tk, d).astype(dk_ref.dtype)
        dv_ref[...] = _heads_unfold(dv, H, Bt, Tk, d).astype(dv_ref.dtype)

    in_specs = [
        pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
        pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
    ]
    args = [q2, k2, v2]
    if has_bias:
        bias_b = bias.shape[0]
        in_specs.append(pl.BlockSpec(
            (Bt if bias_b != 1 else 1, Tq, Tk),
            (lambda i: (i, 0, 0)) if bias_b != 1 else (lambda i: (0, 0, 0))))
        args.append(bias)
    in_specs.append(pl.BlockSpec((8, 128), lambda i: (0, 0)))
    args.append(_seed_tile(seed))
    in_specs.append(pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)))
    args.append(do)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Tq, D), q2.dtype),
                   jax.ShapeDtypeStruct((B, Tk, D), k2.dtype),
                   jax.ShapeDtypeStruct((B, Tk, D), v2.dtype)),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((Bt, Tq, D), lambda i: (i, 0, 0)),
                   pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0)),
                   pl.BlockSpec((Bt, Tk, D), lambda i: (i, 0, 0))),
        interpret=interpret,
    )(*args)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def small_mha_dropout_grad_flat(q2, k2, v2, bias, seed, n_head, scale, rate):
    """Differentiable FLAT-layout fused attention with optional in-kernel
    attention-prob dropout (rate=0 disables the mask draw entirely).

    q2/k2/v2: (B, T, H*d) flat projections; gradients come back flat too,
    so the training path needs no (B,T,H,d) relayouts at all.  seed: (1,)
    int32 (ignored at rate=0); n_head/scale/rate static."""
    return fused_small_mha_dropout_fwd_flat(q2, k2, v2, n_head, bias, seed,
                                            scale, rate)


def _small_mha_drop_flat_fwd(q2, k2, v2, bias, seed, n_head, scale, rate):
    out = fused_small_mha_dropout_fwd_flat(q2, k2, v2, n_head, bias, seed,
                                           scale, rate)
    return out, (q2, k2, v2, bias, seed)


def _small_mha_drop_flat_vjp(n_head, scale, rate, res, do):
    q2, k2, v2, bias, seed = res
    dq, dk, dv = fused_small_mha_dropout_bwd_flat(q2, k2, v2, n_head, bias,
                                                  seed, scale, rate, do)
    dbias = None if bias is None else jnp.zeros_like(bias)
    return dq, dk, dv, dbias, jnp.zeros_like(seed)


small_mha_dropout_grad_flat.defvjp(_small_mha_drop_flat_fwd,
                                   _small_mha_drop_flat_vjp)


def dropout_keep_mask_flat(B: int, Tq: int, Tk: int, H: int, seed,
                           rate: float, interpret=None) -> jnp.ndarray:
    """Validation helper: the exact keep mask the FLAT training kernels
    generate (same per-program seeding; head-MAJOR draw order, unlike
    ``dropout_keep_mask``'s batch-major).  Returns (B, H, Tq, Tk) bool."""
    if interpret is None:
        interpret = not available()
    Bt = _pick_tile(B, cap=_TRAIN_TILE)

    def kernel(seed_ref, o_ref):
        from jax.experimental.pallas import tpu as _pltpu
        _pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        keep = _dropout_keep((H * Bt, Tq, Tk), rate)
        o_ref[...] = jnp.transpose(keep.reshape(H, Bt, Tq, Tk),
                                   (1, 0, 2, 3))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Tk), jnp.bool_),
        grid=(B // Bt,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((Bt, H, Tq, Tk), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(_seed_tile(seed))
