"""Transformer encoder (reference transformer/encoder.py:8-91).

Input embedding is a Linear(feature_dim -> d_model) + LayerNorm + sinusoidal
PE + dropout, followed by N identical self-attention/FFN layers.  All-valid
sequences (the fixed 30-frame video case) pass ``lengths=None`` and skip mask
materialization entirely, letting XLA fuse the whole stack.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import masks as M
from .layers import EncoderLayer, sinusoid_position_encoding

Array = jnp.ndarray


class Encoder(nn.Module):
    d_input: int = 512
    n_layers: int = 6
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_model: int = 512
    d_inner: int = 2048
    dropout: float = 0.1
    pe_maxlen: int = 5000
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: Array, lengths: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        """x: (B, T, d_input); lengths: optional (B,) valid lengths."""
        B, T, _ = x.shape
        non_pad = slf_mask = None
        if lengths is not None:
            non_pad = M.non_pad_mask_from_lengths(lengths, T)
            slf_mask = M.key_pad_mask_from_lengths(lengths, T)

        h = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="linear_in")(x.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, name="layer_norm_in")(
            h.astype(jnp.float32))
        pe = sinusoid_position_encoding(self.pe_maxlen, self.d_model)[:T]
        h = h + jnp.asarray(pe)
        h = nn.Dropout(self.dropout, name="drop_in")(
            h, deterministic=deterministic).astype(self.dtype)

        for i in range(self.n_layers):
            h = EncoderLayer(self.d_model, self.d_inner, self.n_head,
                             self.d_k, self.d_v, self.dropout, self.dtype,
                             self.use_pallas, name=f"layer_{i}")(
                h, non_pad_mask=non_pad, slf_attn_mask=slf_mask,
                deterministic=deterministic)
        return h


def encoder_from_config(dims, d_input: int = 512, dtype=jnp.float32,
                        use_pallas: bool = False) -> Encoder:
    return Encoder(d_input=d_input, n_layers=dims.n_enc_layers,
                   n_head=dims.n_head, d_k=dims.d_k, d_v=dims.d_v,
                   d_model=dims.d_model, d_inner=dims.d_inner,
                   dropout=dims.dropout, pe_maxlen=dims.pe_maxlen, dtype=dtype,
                   use_pallas=use_pallas)
