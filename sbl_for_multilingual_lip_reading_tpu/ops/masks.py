"""Attention / padding mask utilities.

TPU-native rewrite of the reference's mask helpers
(SBL_Multilingual_Lip_reading/transformer/utils.py:94-147).  Everything is
vectorized and static-shape (no per-sample python loops), boolean convention:
``True`` == *masked out* (disallowed), matching the reference's
``masked_fill(mask, -inf)`` usage (attention.py:79).
"""
from __future__ import annotations

import jax.numpy as jnp


def causal_mask(length: int) -> jnp.ndarray:
    """(T, T) upper-triangular mask: True above the diagonal.

    Reference ``get_subsequent_mask`` (transformer/utils.py:117-125).
    """
    return jnp.triu(jnp.ones((length, length), dtype=jnp.bool_), k=1)


def key_pad_mask_from_ids(seq_k: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """(B, Tk) -> (B, 1, Tk) True where key token == pad_id.

    Reference ``get_attn_key_pad_mask`` (transformer/utils.py:128-138);
    broadcast over the query axis instead of materializing (B, Tq, Tk).
    """
    return (seq_k == pad_id)[:, None, :]


def key_pad_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, 1, Tk) True at key positions >= length.

    Reference ``get_attn_pad_mask`` (transformer/utils.py:141-147).
    """
    pos = jnp.arange(max_len)[None, :]
    return (pos >= lengths[:, None])[:, None, :]


def non_pad_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) -> (B, T, 1) float mask, 1.0 at valid positions.

    Reference ``get_non_pad_mask`` with input_lengths (utils.py:99-114).
    """
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None])[..., None].astype(jnp.float32)


def non_pad_mask_from_ids(seq: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """(B, T) -> (B, T, 1) float mask, 1.0 where token != pad_id."""
    return (seq != pad_id)[..., None].astype(jnp.float32)


def combine(*masks):
    """OR-combine broadcastable boolean masks; returns None if all None."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_or(out, m)
    return out
