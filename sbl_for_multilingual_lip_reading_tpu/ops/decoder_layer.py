"""Fused SBL decoder-layer megakernel (TPU Pallas, inference path).

One decode step of one decoder layer is, in the reference and in the
module-composed path, ~15 separate ops: three QKV projections, attention,
out-projection, dropout, residual+LN, a cross-attention block, and a 2-GEMM
FFN with another LN (SBL_Multilingual_Lip_reading/transformer/decoder.py:
127-165, attention.py:40-58, module.py:35-55).  At decode shapes
(B<=512, L<=17, d_model 512) every one of those ops is HBM-bandwidth- or
launch-overhead-bound: the decode loop runs 16 steps x 6 layers x 2
directions, so the layer boundary tensors cross HBM dozens of times.

This kernel computes the ENTIRE layer -- self-attention (QKV + softmax +
out-proj + residual + LN), cached cross-attention (Q + softmax vs
precomputed encoder K/V + out-proj + residual + LN), and the FFN (w1 +
relu + w2 + residual + LN) -- in one Pallas program per batch tile, keeping
every intermediate in VMEM.  Weights (~7.3 MB bf16 incl. the 2x512x2048
FFN) are fetched once and stay resident across batch tiles (constant
index_map).  All matmuls accumulate fp32 on the MXU; LN/residual run fp32;
sublayer boundaries round to the compute dtype exactly like the
module-composed path so results match it to numerical tolerance.

Used by models.decoder_sbl._SBLLayer on the deterministic (inference) path;
training keeps the module composition (it needs dropout + custom VJPs).
Direction-vmapped by the caller like the ops.attention kernels.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .attention import available

# rows of the packed (13, d_model) fp32 epilogue-vector input
_VEC_ROWS = ("bq", "bk", "bv", "fc_b", "ln1_s", "ln1_b",
             "bq2", "fc2_b", "ln2_s", "ln2_b", "b2", "ln3_s", "ln3_b")
_LN_EPS = 1e-6


def _ln(x32, scale, bias):
    """LayerNorm over the last dim, fp32 (matches flax nn.LayerNorm)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
    return (x32 - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _heads(x3, H, d):
    """(Bt, L, H*d) -> (H*Bt, L, d), HEAD-major batch order.

    Mosaic reshape legality (measured, tools/mosaic_probe.py +
    fused_layer_probe.py bisects): minor-dim splits are illegal everywhere;
    row splits are legal only with a wide minor ((272,512)->(16,17,512) OK,
    (2176,64)->(128,17,64) REJECTED); minor slices and leading concats are
    always legal.  So the head split never reshapes a d=64-minor tensor:
    slice heads off the 512-wide minor in 3-D, concat along the leading
    (batch) axis."""
    return jnp.concatenate(
        [x3[:, :, h * d:(h + 1) * d] for h in range(H)], axis=0)


def _unheads(x, Bt, H, L, d):
    """(H*Bt, L, d) head-major -> (Bt, L, H*d): leading split (legal on a
    64-minor), per-head squeeze, minor concat back to a 512 minor."""
    x4 = x.reshape(H, Bt, L, d)
    return jnp.concatenate([x4[h] for h in range(H)], axis=-1)


def _attend_batched(q, k, v, bias, scale, Bt, H):
    """q: (Bt*H, Lq, d), k/v: (Bt*H, Lk, d), bias: (Lq, Lk) or None."""
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _layer_kernel(x_ref, wq_ref, wk_ref, wv_ref, fc_ref, wq2_ref, fc2_ref,
                  w1_ref, w2_ref, vec_ref, b1_ref, ckh_ref, cvh_ref,
                  bias_ref, o_ref, *, H: int, d_k: int, scale: float,
                  has_bias: bool):
    Bt, L, D = x_ref.shape
    Tk = ckh_ref.shape[1]
    cdt = x_ref.dtype
    v = {name: vec_ref[i] for i, name in enumerate(_VEC_ROWS)}

    x3 = x_ref[...]                                     # (Bt, L, D)
    xf3 = x3.astype(jnp.float32)

    def proj3(h3d, w_ref, b):
        # GEMM in 2-D (the row collapse and the wide-minor row split back
        # are both Mosaic-legal casts), result (Bt, L, Dout) fp32
        h2d = h3d.reshape(Bt * L, h3d.shape[-1])
        y = jnp.dot(h2d, w_ref[...], preferred_element_type=jnp.float32)
        return (y + b[None]).reshape(Bt, L, w_ref.shape[1])

    # ---- self-attention sublayer -----------------------------------------
    qh = _heads(proj3(x3, wq_ref, v["bq"]).astype(cdt), H, d_k)
    kh = _heads(proj3(x3, wk_ref, v["bk"]).astype(cdt), H, d_k)
    vh = _heads(proj3(x3, wv_ref, v["bv"]).astype(cdt), H, d_k)
    bias = bias_ref[...].astype(jnp.float32) if has_bias else None
    ctx = _unheads(_attend_batched(qh, kh, vh, bias, scale, Bt, H),
                   Bt, H, L, d_k).astype(cdt)
    h1 = _ln(proj3(ctx, fc_ref, v["fc_b"]) + xf3, v["ln1_s"], v["ln1_b"])
    h1c = h1.astype(cdt)

    # ---- cached cross-attention sublayer ----------------------------------
    q2 = _heads(proj3(h1c, wq2_ref, v["bq2"]).astype(cdt), H, d_k)
    # head-major (H, Bt) batch order to match _heads
    ck = jnp.transpose(ckh_ref[...], (2, 0, 1, 3)).reshape(H * Bt, Tk, d_k)
    cv = jnp.transpose(cvh_ref[...], (2, 0, 1, 3)).reshape(H * Bt, Tk, d_k)
    ctx2 = _unheads(_attend_batched(q2, ck, cv, None, scale, Bt, H),
                    Bt, H, L, d_k).astype(cdt)
    h2 = _ln(proj3(ctx2, fc2_ref, v["fc2_b"]) + h1, v["ln2_s"], v["ln2_b"])
    h2c = h2.astype(cdt)

    # ---- FFN sublayer ------------------------------------------------------
    u = jnp.dot(h2c.reshape(Bt * L, D), w1_ref[...],
                preferred_element_type=jnp.float32)
    u = jnp.maximum(u + b1_ref[0][None], 0.0).astype(cdt)
    h3 = _ln(proj3(u.reshape(Bt, L, u.shape[-1]), w2_ref, v["b2"]) + h2,
             v["ln3_s"], v["ln3_b"])
    o_ref[...] = h3.astype(o_ref.dtype)


def layer_params_to_args(p) -> tuple:
    """Flatten an ``_SBLLayer`` param tree (children ``slf``/``cross``/``ffn``,
    see models/decoder_sbl.py) into the positional weight arguments of
    :func:`fused_decoder_layer` (everything between ``x`` and ``ckh``)."""
    slf, cross, ffn = p["slf"], p["cross"], p["ffn"]
    return (
        slf["w_qs"]["kernel"], slf["w_qs"]["bias"],
        slf["w_ks"]["kernel"], slf["w_ks"]["bias"],
        slf["w_vs"]["kernel"], slf["w_vs"]["bias"],
        slf["fc"]["kernel"], slf["fc"]["bias"],
        slf["layer_norm"]["scale"], slf["layer_norm"]["bias"],
        cross["w_qs"]["kernel"], cross["w_qs"]["bias"],
        cross["fc"]["kernel"], cross["fc"]["bias"],
        cross["layer_norm"]["scale"], cross["layer_norm"]["bias"],
        ffn["w_1"]["kernel"], ffn["w_1"]["bias"],
        ffn["w_2"]["kernel"], ffn["w_2"]["bias"],
        ffn["layer_norm"]["scale"], ffn["layer_norm"]["bias"],
    )


def _pick_tile(B: int) -> int:
    # cap 8: tile 16 exceeded the 16 MB scoped VMEM limit by ~2.7 MB when
    # the kernel runs direction-vmapped with (Tk=30) cross K/V blocks
    from .attention import _pick_tile as pick
    return pick(B, cap=8)


def fused_decoder_layer(x: jnp.ndarray,
                        wq, bq, wk, bk, wv, bv, fc_w, fc_b, ln1_s, ln1_b,
                        wq2, bq2, fc2_w, fc2_b, ln2_s, ln2_b,
                        w1, b1, w2, b2, ln3_s, ln3_b,
                        ckh: jnp.ndarray, cvh: jnp.ndarray,
                        mask_bias: Optional[jnp.ndarray] = None,
                        scale: Optional[float] = None,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
    """One full SBL decoder layer, fused.

    x:        (B, L, d_model) compute-dtype hidden states
    w*/b*/ln*: layer params (fp32, cast in here); kernels are (in, out)
    ckh/cvh:  (B, Tk, H, d_k) precomputed cross K/V (CrossKV outputs)
    mask_bias: optional (L, L) fp32 additive self-attention bias
    Returns (B, L, d_model) in x.dtype.
    """
    B, L, D = x.shape
    Tk, H, d_k = ckh.shape[1], ckh.shape[2], ckh.shape[3]
    DI = w1.shape[1]
    if scale is None:
        scale = 1.0 / np.sqrt(d_k)
    if interpret is None:
        interpret = not available()
    cdt = x.dtype

    vecs = jnp.stack([bq, bk, bv, fc_b, ln1_s, ln1_b, bq2, fc2_b, ln2_s,
                      ln2_b, b2, ln3_s, ln3_b]).astype(jnp.float32)
    b1v = b1.reshape(1, DI).astype(jnp.float32)
    ws = [w.astype(cdt) for w in (wq, wk, wv, fc_w, wq2, fc2_w, w1, w2)]

    Bt = _pick_tile(B)
    has_bias = mask_bias is not None

    import functools
    kernel = functools.partial(_layer_kernel, H=H, d_k=d_k, scale=scale,
                               has_bias=has_bias)
    if not has_bias:
        def kernel(*refs, _k=functools.partial(
                _layer_kernel, H=H, d_k=d_k, scale=scale, has_bias=False)):
            *ins, o_ref = refs
            _k(*ins[:13], None, o_ref)

    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((Bt, L, D), lambda i: (i, 0, 0)),
        const(D, H * d_k), const(D, H * d_k), const(D, H * d_k),
        const(H * d_k, D), const(D, H * d_k), const(H * d_k, D),
        const(D, DI), const(DI, D),
        const(len(_VEC_ROWS), D), const(1, DI),
        pl.BlockSpec((Bt, Tk, H, d_k), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((Bt, Tk, H, d_k), lambda i: (i, 0, 0, 0)),
    ]
    args = [x] + ws + [vecs, b1v, ckh.astype(cdt), cvh.astype(cdt)]
    if has_bias:
        in_specs.append(const(L, L))
        args.append(mask_bias.astype(jnp.float32))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, L, D), cdt),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Bt, L, D), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*args)
