"""Unidirectional transformer decoder (LRW / LRW-1000 seq2seq workloads).

Rewrite of the reference per-project decoders
(VSR_seq2seq_Transformer_with_phonemes_LRW/transformer/decoder.py:19-200 and
the LRW1000 variant).  Training is a single parallel teacher-forced forward
(one fused graph -- no step loop); greedy decode is a ``lax.scan``.  The
encoder sequence's cross-attention K/V are projected ONCE per clip
(``CrossKV``) instead of at every decode step.

Parity notes:
* target preprocessing adds sos on the input side and eos on the output side;
  inputs are padded with eos, gold with IGNORE_ID (decoder.py:64-79 -- unlike
  the SBL decoder which eos-pads gold too).
* optional tied embedding/projection with ``x_logit_scale = d_model**-0.5``
  applied to the input embedding (decoder.py:57-62).
* masks: causal + key-pad (ys_in == eos) self-attention; encoder-length
  cross-attention mask (decoder.py:95-110).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import masks as M
from ..vocab import IGNORE_ID, SOS_ID, EOS_ID
from .layers import (CachedCrossAttention, CrossKV, MultiHeadAttention,
                     PositionwiseFeedForward, sinusoid_position_encoding)

Array = jnp.ndarray


def make_uni_cache(batch: int, length: int, n_layers: int, kd: int, vd: int,
                   dtype) -> tuple:
    """Zeroed per-layer self-attention K/V caches for cached decode: a
    tuple over layers of ((batch, length, kd), (batch, length, vd)) flat
    projected tensors.  Module-free so search drivers can build it without
    an ``apply`` (decode/beam.py)."""
    return tuple((jnp.zeros((batch, length, kd), dtype),
                  jnp.zeros((batch, length, vd), dtype))
                 for _ in range(n_layers))


def preprocess_targets_uni(labels: Array, maxlen: int,
                           sos_id: int = SOS_ID, eos_id: int = EOS_ID,
                           ignore_id: int = IGNORE_ID) -> Tuple[Array, Array]:
    """(B, P) IGNORE-padded labels -> (ys_in (B, maxlen), ys_out (B, maxlen)).

    ys_in  = [sos, y_0..y_{n-1}, eos, eos, ...]   (eos-padded)
    ys_out = [y_0..y_{n-1}, eos, IGNORE, ...]     (IGNORE-padded gold)
    """
    B, P = labels.shape
    lengths = jnp.sum(labels != ignore_id, axis=1)
    pos = jnp.arange(maxlen)[None, :]

    take = min(P, maxlen)
    clean = jnp.where(labels[:, :take] != ignore_id,
                      labels[:, :take], eos_id).astype(jnp.int32)

    ys_in = jnp.full((B, maxlen), eos_id, jnp.int32)
    ys_in = ys_in.at[:, 0].set(sos_id)
    ys_in = ys_in.at[:, 1:take + 1 if take + 1 <= maxlen else maxlen].set(
        clean[:, :maxlen - 1])

    ys_out = jnp.full((B, maxlen), eos_id, jnp.int32)
    ys_out = ys_out.at[:, :take].set(clean)
    ys_out = jnp.where(pos < lengths[:, None], ys_out,
                       jnp.where(pos == lengths[:, None], eos_id, ignore_id))
    return ys_in, ys_out.astype(jnp.int32)


class UniDecoder(nn.Module):
    vocab_size: int = 42
    d_model: int = 512
    n_layers: int = 6
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_inner: int = 2048
    dropout: float = 0.1
    pe_maxlen: int = 5000
    maxlen: int = 14
    tie_embedding: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def setup(self):
        self.tgt_word_emb = nn.Embed(
            self.vocab_size, self.d_model,
            embedding_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype)
        self.emb_drop = nn.Dropout(self.dropout)
        self.slf_attn = [
            MultiHeadAttention(self.d_model, self.n_head, self.d_k, self.d_v,
                               self.dropout, self.dtype, self.use_pallas)
            for _ in range(self.n_layers)]
        self.enc_attn = [
            CachedCrossAttention(self.d_model, self.n_head, self.d_k,
                                 self.d_v, self.dropout, self.dtype,
                                 self.use_pallas)
            for _ in range(self.n_layers)]
        self.pos_ffn = [
            PositionwiseFeedForward(self.d_model, self.d_inner, self.dropout,
                                    self.dtype)
            for _ in range(self.n_layers)]
        self.cross_kv = [
            CrossKV(self.d_model, self.n_head, self.d_k, self.d_v, self.dtype)
            for _ in range(self.n_layers)]
        if not self.tie_embedding:
            self.tgt_word_prj = nn.Dense(
                self.vocab_size, use_bias=False,
                kernel_init=nn.initializers.xavier_normal(),
                dtype=self.dtype)
        self.x_logit_scale = (self.d_model ** -0.5) if self.tie_embedding else 1.0

    def _embed(self, ys: Array, deterministic: bool) -> Array:
        T = ys.shape[1]
        pe = jnp.asarray(sinusoid_position_encoding(self.pe_maxlen,
                                                    self.d_model)[:T])
        h = self.tgt_word_emb(ys) * self.x_logit_scale + pe.astype(self.dtype)
        return self.emb_drop(h, deterministic=deterministic)

    def _project(self, h: Array) -> Array:
        if self.tie_embedding:
            w = self.tgt_word_emb.embedding.astype(self.dtype)
            return jnp.einsum("...td,vd->...tv", h, w,
                              preferred_element_type=jnp.float32)
        return self.tgt_word_prj(h).astype(jnp.float32)

    def _compute_kv(self, enc_output: Array):
        enc = enc_output.astype(self.dtype)
        return tuple(kv(enc) for kv in self.cross_kv)

    def _stack(self, h: Array, enc_kv, non_pad, slf_mask, dec_enc_mask,
               deterministic: bool) -> Array:
        for slf, cross, ffn, (kh, vh) in zip(self.slf_attn, self.enc_attn,
                                             self.pos_ffn, enc_kv):
            h = slf(h, h, h, mask=slf_mask, deterministic=deterministic)
            if non_pad is not None:
                h = h * non_pad.astype(h.dtype)
            h = cross(h, kh, vh, mask=dec_enc_mask,
                      deterministic=deterministic)
            if non_pad is not None:
                h = h * non_pad.astype(h.dtype)
            h = ffn(h, deterministic=deterministic)
            if non_pad is not None:
                h = h * non_pad.astype(h.dtype)
        return h

    def __call__(self, labels: Array, enc_output: Array,
                 enc_lengths: Optional[Array] = None,
                 deterministic: bool = False):
        """Parallel teacher-forced forward.  Returns (pred, gold):
        logits (B, maxlen, V) float32 and IGNORE-padded gold (B, maxlen)."""
        ys_in, ys_out = preprocess_targets_uni(labels, self.maxlen)
        B, T = ys_in.shape
        Tk = enc_output.shape[1]
        non_pad = M.non_pad_mask_from_ids(ys_in, EOS_ID)
        slf_mask = jnp.logical_or(M.causal_mask(T)[None],
                                  M.key_pad_mask_from_ids(ys_in, EOS_ID))
        dec_enc_mask = (M.key_pad_mask_from_lengths(enc_lengths, Tk)
                        if enc_lengths is not None else None)
        h = self._embed(ys_in, deterministic)
        h = self._stack(h, self._compute_kv(enc_output), non_pad, slf_mask,
                        dec_enc_mask, deterministic)
        logits = self._project(h).astype(jnp.float32)
        return logits, ys_out

    def recognize_greedy(self, enc_output: Array,
                         maxlen: Optional[int] = None,
                         kv_cache: bool = True) -> Array:
        """Batched greedy decode.  Returns (B, L+1) ids incl. leading sos.

        Default path caches per-layer self-attention K/V across steps
        (token-identical to the uncached path, tested); ``kv_cache=False``
        reproduces the reference's O(T^2) full-prefix re-run shape
        (LRW decoder.py:138-176) for parity checks."""
        if kv_cache:
            return self.recognize_greedy_cached(enc_output, maxlen=maxlen)
        return self.recognize_greedy_uncached(enc_output, maxlen=maxlen)

    def recognize_greedy_uncached(self, enc_output: Array,
                                  maxlen: Optional[int] = None) -> Array:
        """Reference-shaped greedy decode (LRW decoder.py:138-176): re-runs
        the full prefix each step inside one ``lax.scan`` (cross K/V
        projected once).  Returns (B, L+1) token ids incl. the leading sos."""
        steps = self.maxlen if maxlen is None else maxlen
        B = enc_output.shape[0]
        L = steps + 1
        enc_kv = self._compute_kv(enc_output)
        ys0 = jnp.full((B, L), SOS_ID, jnp.int32)
        causal = M.causal_mask(L)[None]

        def body(ys, step):
            beyond = (jnp.arange(L) > step)[None, None, :]
            slf_mask = jnp.logical_or(causal, beyond)
            h = self._embed(ys, True)
            h = self._stack(h, enc_kv, None, slf_mask, None, True)
            logits = self._project(h)
            last = jax.lax.dynamic_slice_in_dim(logits, step, 1, axis=1)[:, 0]
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            ys = jax.lax.dynamic_update_slice_in_dim(
                ys, nxt[:, None], step + 1, axis=1)
            return ys, last

        ys, step_logits = jax.lax.scan(
            body, ys0, jnp.arange(steps, dtype=jnp.int32))
        return ys

    # ------------------------------------------------------- KV-cached path
    def _embed_token(self, tok: Array, step: Array) -> Array:
        """Embed ONE position: tok (B,) ids at position ``step`` ->
        (B, 1, d_model).  Deterministic (no dropout) -- decode only."""
        pe = jnp.asarray(sinusoid_position_encoding(self.pe_maxlen,
                                                    self.d_model))
        pe_t = jax.lax.dynamic_slice_in_dim(pe, step, 1, axis=0)
        return (self.tgt_word_emb(tok[:, None]) * self.x_logit_scale
                + pe_t[None].astype(self.dtype))

    def decode_step_cached(self, tok: Array, cache, enc_kv, step: Array):
        """One cached autoregressive step.  tok: (B,) token ids at position
        ``step``; cache: tuple over layers of (k_cache, v_cache) flat
        (B, L, h*d) tensors (see ``make_uni_cache``).  Returns
        (logits (B, V) float32 for position step, new cache)."""
        h = self._embed_token(tok, step)
        new_cache = []
        for slf, cross, ffn, (kh, vh), (kc, vc) in zip(
                self.slf_attn, self.enc_attn, self.pos_ffn, enc_kv, cache):
            h, kc, vc = slf.decode_step(h, kc, vc, step)
            new_cache.append((kc, vc))
            h = cross(h, kh, vh, mask=None, deterministic=True)
            h = ffn(h, deterministic=True)
        return self._project(h)[:, 0].astype(jnp.float32), tuple(new_cache)

    def recognize_greedy_cached(self, enc_output: Array,
                                maxlen: Optional[int] = None) -> Array:
        """KV-cached greedy decode: each step projects/attends only the new
        token against per-layer (B, L, h*d) caches carried through one
        ``lax.scan`` -- ~L x fewer decode token-steps than the reference's
        full-prefix re-run.  Token-identical to the uncached path (the
        per-position attention reductions are the same sums over the same
        values; tested in tests/test_decoder_uni.py)."""
        steps = self.maxlen if maxlen is None else maxlen
        B = enc_output.shape[0]
        L = steps + 1
        enc_kv = self._compute_kv(enc_output)
        cache0 = make_uni_cache(B, L, self.n_layers, self.n_head * self.d_k,
                                self.n_head * self.d_v, self.dtype)
        ys0 = jnp.full((B, L), SOS_ID, jnp.int32)

        def body(carry, step):
            ys, cache = carry
            tok = jax.lax.dynamic_slice_in_dim(ys, step, 1, axis=1)[:, 0]
            logits, cache = self.decode_step_cached(tok, cache, enc_kv, step)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ys = jax.lax.dynamic_update_slice_in_dim(
                ys, nxt[:, None], step + 1, axis=1)
            return (ys, cache), None

        (ys, _), _ = jax.lax.scan(body, (ys0, cache0),
                                  jnp.arange(steps, dtype=jnp.int32))
        return ys

    def step_logits(self, ys: Array, enc_output: Array, step: Array) -> Array:
        """Logits for position ``step`` given token buffer ``ys`` (B, L).
        Building block for external search loops (beam search)."""
        return self.step_logits_cached(ys, self._compute_kv(enc_output), step)

    def step_logits_cached(self, ys: Array, enc_kv, step: Array) -> Array:
        """Like step_logits but with precomputed cross-attention K/V."""
        L = ys.shape[1]
        beyond = (jnp.arange(L) > step)[None, None, :]
        slf_mask = jnp.logical_or(M.causal_mask(L)[None], beyond)
        h = self._embed(ys, True)
        h = self._stack(h, enc_kv, None, slf_mask, None, True)
        last = jax.lax.dynamic_slice_in_dim(h, step, 1, axis=1)[:, 0]
        return self._project(last[:, None])[:, 0].astype(jnp.float32)

    def compute_cross_kv(self, enc_output: Array):
        """Public K/V precompute for search drivers (decode/beam.py)."""
        return self._compute_kv(enc_output)
