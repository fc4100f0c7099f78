"""Core transformer building blocks (Flax/Linen, TPU-first).

Functional rewrites of the reference model library
(SBL_Multilingual_Lip_reading/transformer/{attention,module}.py):

* ``MultiHeadAttention`` -- 8 heads, d_k=d_v=64, *post-LN* residual
  (``LayerNorm(dropout(out_proj(attn)) + q)``, attention.py:56-58).  The
  reference's per-head ``(n*b, len, d)`` reshape dance is replaced by a
  single batched einsum that XLA maps straight onto the MXU; softmax is
  computed in float32 for bf16 safety.
* ``PositionwiseFeedForward`` -- w2(relu(w1(x))) with post-LN residual
  (module.py:35-55).
* ``sinusoid_position_encoding`` -- the fixed PE table (module.py:8-32).
* ``EncoderLayer`` / ``DecoderLayer`` -- sublayer compositions including the
  reference's ``*= non_pad_mask`` zeroing after every sublayer
  (encoder.py:85-89, decoder.py:396-408).

Masks are boolean with True == disallowed (see ops/masks.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray

# Large-negative fill for masked logits; -inf is avoided so fully-masked
# rows (which cannot occur in valid configs, but may in padded buffers)
# produce uniform attention instead of NaN.
_MASK_FILL = -1e9


def sinusoid_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) float32 sinusoidal table (reference module.py:16-26)."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * -(np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class MultiHeadAttention(nn.Module):
    """setup()-based (not compact) so the autoregressive ``decode_step``
    method can share the projection submodules with ``__call__``; the
    submodule names (w_qs/w_ks/w_vs/fc/layer_norm) match the reference's
    attribute names (attention.py:14-30), keeping the param tree identical
    to the original compact formulation."""
    d_model: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False  # fused VMEM attention kernel (TPU only)

    def setup(self):
        d_model, h, d_k, d_v = self.d_model, self.n_head, self.d_k, self.d_v
        # init parity: reference draws q/k proj from N(0, 2/(d_model+d_k))
        # (attention.py:19-21); out proj xavier-normal (attention.py:28).
        qk_init = nn.initializers.normal(stddev=float(np.sqrt(2.0 / (d_model + d_k))))
        v_init = nn.initializers.normal(stddev=float(np.sqrt(2.0 / (d_model + d_v))))
        self.w_qs = nn.Dense(h * d_k, kernel_init=qk_init, dtype=self.dtype)
        self.w_ks = nn.Dense(h * d_k, kernel_init=qk_init, dtype=self.dtype)
        self.w_vs = nn.Dense(h * d_v, kernel_init=v_init, dtype=self.dtype)
        self.fc = nn.Dense(d_model,
                           kernel_init=nn.initializers.xavier_normal(),
                           dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)
        self.out_drop = nn.Dropout(self.dropout)
        self.layer_norm = nn.LayerNorm(dtype=jnp.float32)

    def __call__(self, q: Array, k: Array, v: Array,
                 mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """q/k/v: (B, T, d_model); mask broadcastable to (B, Tq, Tk)."""
        residual = q
        h, d_k, d_v = self.n_head, self.d_k, self.d_v

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        # projections stay FLAT (B, T, h*d); head split happens in VMEM on
        # the deterministic Pallas path (the 512 -> (8, 64) minor-dim
        # reshape is a physical relayout XLA must copy for -- ~8 ms/iter of
        # decode @B=256 on the device trace) and lazily elsewhere
        q2, k2, v2 = self.w_qs(q), self.w_ks(k), self.w_vs(v)

        scale = 1.0 / np.sqrt(d_k)
        use_pallas = self.use_pallas
        if use_pallas:
            from ..ops.attention import (available, fused_small_mha_flat,
                                         small_mha_dropout_grad_flat)
            if available():
                bias = None
                if mask is not None:
                    mb = mask.shape[0]
                    bias = jnp.where(
                        jnp.broadcast_to(mask, (mb, Tq, Tk)) if mask.ndim == 3
                        else mask, _MASK_FILL, 0.0).astype(jnp.float32)
                    bias = jnp.broadcast_to(bias, (mb, Tq, Tk))
                if deterministic:
                    ctx = fused_small_mha_flat(q2, k2, v2, h, bias=bias,
                                               scale=scale)
                else:
                    # flat-layout custom-VJP kernel: in-kernel attention-prob
                    # dropout (mask regenerated in the backward from the same
                    # seed); no (B,T,H,d) relayouts on the training path
                    if self.dropout == 0.0:
                        seed = jnp.zeros((1,), jnp.int32)
                    else:
                        seed = jax.random.randint(
                            self.make_rng("dropout"), (1,), 0, 2_147_483_647,
                            dtype=jnp.int32)
                    ctx = small_mha_dropout_grad_flat(q2, k2, v2, bias, seed,
                                                      h, scale, self.dropout)
            else:
                use_pallas = False
        if not use_pallas:
            qh = q2.reshape(B, Tq, h, d_k)
            kh = k2.reshape(B, Tk, h, d_k)
            vh = v2.reshape(B, Tk, h, d_v)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                logits = jnp.where(mask[:, None, :, :], _MASK_FILL, logits)
            attn = nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
            attn = self.attn_drop(attn, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            ctx = ctx.reshape(B, Tq, h * d_v)
        out = self.fc(ctx)
        out = self.out_drop(out, deterministic=deterministic)
        out = self.layer_norm(
            out.astype(jnp.float32) + residual.astype(jnp.float32))
        return out.astype(self.dtype)

    def decode_step(self, x: Array, k_cache: Array, v_cache: Array,
                    step: Array):
        """One autoregressive self-attention step with a K/V cache.

        The reference decoders re-project and re-attend the whole prefix
        every step (VSR_seq2seq_Transformer_with_phonemes_LRW/transformer/
        decoder.py:138-176, O(T^2) per clip); here each step projects only
        the NEW position and appends to flat (B, L, h*d) caches -- the
        classical TPU decode idiom (static shapes, one dynamic_update_slice
        per step, no relayout since caches stay flat).

        x: (B, 1, d_model) layer input at position ``step``;
        k_cache/v_cache: (B, L, h*d) projected caches, slots >= step unset.
        Returns (out (B, 1, d_model), k_cache, v_cache) with slot ``step``
        written.  Deterministic (inference) path only.
        """
        h, d_k, d_v = self.n_head, self.d_k, self.d_v
        B = x.shape[0]
        L = k_cache.shape[1]
        q2 = self.w_qs(x)                                   # (B, 1, h*d_k)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, self.w_ks(x), step, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, self.w_vs(x), step, axis=1)
        qh = q2.reshape(B, h, d_k)
        kh = k_cache.reshape(B, L, h, d_k)
        vh = v_cache.reshape(B, L, h, d_v)
        logits = jnp.einsum("bhd,bkhd->bhk", qh, kh,
                            preferred_element_type=jnp.float32) / np.sqrt(d_k)
        invalid = (jnp.arange(L) > step)[None, None, :]
        logits = jnp.where(invalid, _MASK_FILL, logits)
        attn = nn.softmax(logits.astype(jnp.float32),
                          axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhk,bkhd->bhd", attn, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = self.fc(ctx.reshape(B, 1, h * d_v))
        out = self.layer_norm(
            out.astype(jnp.float32) + x.astype(jnp.float32))
        return out.astype(self.dtype), k_cache, v_cache


class CrossKV(nn.Module):
    """Key/value projection heads for cross-attention, split out of the
    attention module so autoregressive decoders can project the encoder
    sequence ONCE instead of at every decode step (the reference re-runs
    ``w_ks``/``w_vs`` over the encoder outputs 16 x 12 times per clip,
    decoder.py:106-164)."""
    d_model: int
    n_head: int
    d_k: int
    d_v: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc: Array):
        """Returns FLAT (B, Tk, h*d) key/value projections; consumers that
        need the (B, Tk, h, d) head-split layout reshape at use site (for
        the training kernels XLA hoists that loop-invariant relayout out of
        the decode scan; the deterministic flat-layout Pallas path needs no
        reshape at all)."""
        h, d_k, d_v, d_model = self.n_head, self.d_k, self.d_v, self.d_model
        qk_init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (d_model + d_k))))
        v_init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (d_model + d_v))))
        k2 = nn.Dense(h * d_k, kernel_init=qk_init, dtype=self.dtype,
                      name="w_ks")(enc)
        v2 = nn.Dense(h * d_v, kernel_init=v_init, dtype=self.dtype,
                      name="w_vs")(enc)
        return k2, v2


class CachedCrossAttention(nn.Module):
    """Multi-head cross-attention consuming precomputed (kh, vh) from
    ``CrossKV``.  Identical math to ``MultiHeadAttention`` (post-LN
    residual, fp32 softmax) minus the per-call K/V projections."""
    d_model: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, q: Array, k2: Array, v2: Array,
                 mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """k2/v2: FLAT (B, Tk, h*d) CrossKV outputs."""
        residual = q
        h, d_k, d_v, d_model = self.n_head, self.d_k, self.d_v, self.d_model
        qk_init = nn.initializers.normal(
            stddev=float(np.sqrt(2.0 / (d_model + d_k))))
        B, Tq, _ = q.shape
        Tk = k2.shape[1]
        q2 = nn.Dense(h * d_k, kernel_init=qk_init, dtype=self.dtype,
                      name="w_qs")(q)
        scale = 1.0 / np.sqrt(d_k)
        use_pallas = self.use_pallas
        if use_pallas:
            from ..ops.attention import (available, fused_small_mha_flat,
                                         small_mha_dropout_grad_flat)
            if available():
                bias = None
                if mask is not None:
                    mb = mask.shape[0]
                    bias = jnp.where(jnp.broadcast_to(mask, (mb, Tq, Tk)),
                                     _MASK_FILL, 0.0).astype(jnp.float32)
                if deterministic:
                    ctx = fused_small_mha_flat(q2, k2, v2, h, bias=bias,
                                               scale=scale)
                else:
                    # flat custom-VJP kernel (see MultiHeadAttention): the
                    # CrossKV outputs are already flat, so the training path
                    # consumes them with zero relayouts
                    if self.dropout == 0.0:
                        seed = jnp.zeros((1,), jnp.int32)
                    else:
                        seed = jax.random.randint(
                            self.make_rng("dropout"), (1,), 0, 2_147_483_647,
                            dtype=jnp.int32)
                    ctx = small_mha_dropout_grad_flat(q2, k2, v2, bias, seed,
                                                      h, scale, self.dropout)
            else:
                use_pallas = False
        if not use_pallas:
            qh = q2.reshape(B, Tq, h, d_k)
            kh = k2.reshape(B, Tk, h, d_k)
            vh = v2.reshape(B, Tk, h, d_v)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                logits = jnp.where(mask[:, None, :, :], _MASK_FILL, logits)
            attn = nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout, name="attn_drop")(
                attn, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            ctx = ctx.reshape(B, Tq, h * d_v)
        out = nn.Dense(d_model, kernel_init=nn.initializers.xavier_normal(),
                       dtype=self.dtype, name="fc")(ctx)
        out = nn.Dropout(self.dropout, name="out_drop")(
            out, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            out.astype(jnp.float32) + residual.astype(jnp.float32))
        return out.astype(self.dtype)


class PositionwiseFeedForward(nn.Module):
    d_model: int
    d_inner: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        residual = x
        h = nn.Dense(self.d_inner, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(), name="w_1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(), name="w_2")(h)
        h = nn.Dropout(self.dropout, name="drop")(h, deterministic=deterministic)
        out = nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(
            h.astype(jnp.float32) + residual.astype(jnp.float32))
        return out.astype(self.dtype)


class EncoderLayer(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, non_pad_mask: Optional[Array] = None,
                 slf_attn_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        x = MultiHeadAttention(self.d_model, self.n_head, self.d_k, self.d_v,
                               self.dropout, self.dtype, self.use_pallas,
                               name="slf_attn")(
            x, x, x, mask=slf_attn_mask, deterministic=deterministic)
        if non_pad_mask is not None:
            x = x * non_pad_mask.astype(x.dtype)
        x = PositionwiseFeedForward(self.d_model, self.d_inner, self.dropout,
                                    self.dtype, name="pos_ffn")(
            x, deterministic=deterministic)
        if non_pad_mask is not None:
            x = x * non_pad_mask.astype(x.dtype)
        return x


class DecoderLayer(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, enc_output: Array,
                 non_pad_mask: Optional[Array] = None,
                 slf_attn_mask: Optional[Array] = None,
                 dec_enc_attn_mask: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        x = MultiHeadAttention(self.d_model, self.n_head, self.d_k, self.d_v,
                               self.dropout, self.dtype, self.use_pallas,
                               name="slf_attn")(
            x, x, x, mask=slf_attn_mask, deterministic=deterministic)
        if non_pad_mask is not None:
            x = x * non_pad_mask.astype(x.dtype)
        x = MultiHeadAttention(self.d_model, self.n_head, self.d_k, self.d_v,
                               self.dropout, self.dtype, self.use_pallas,
                               name="enc_attn")(
            x, enc_output, enc_output, mask=dec_enc_attn_mask,
            deterministic=deterministic)
        if non_pad_mask is not None:
            x = x * non_pad_mask.astype(x.dtype)
        x = PositionwiseFeedForward(self.d_model, self.d_inner, self.dropout,
                                    self.dtype, name="pos_ffn")(
            x, deterministic=deterministic)
        if non_pad_mask is not None:
            x = x * non_pad_mask.astype(x.dtype)
        return x
