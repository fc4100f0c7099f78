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
