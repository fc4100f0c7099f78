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
