"""Synchronous bidirectional (L2R + R2L) decoder -- the SBL novelty.

TPU-native rewrite of the reference SBL decoder
(SBL_Multilingual_Lip_reading/transformer/decoder.py:16-408).  The reference
drives 16 python-loop decode steps *even in training*, with O(L^2) python
fusion loops after every layer (decoder.py:136-164).  Here the whole
autoregressive process is a single ``nn.scan`` (=> one compiled XLA loop) over
fixed-size token buffers, and the cross-direction fusion is one vectorized
gather-reverse-add.

Semantics reproduced exactly (see tests/test_decoder_sbl.py):

* step-wise decode over ``maxlen=16`` steps with fixed-size (maxlen+1) token
  buffers; step ``i`` attends over prefix length ``i+1``.
* the FIRST decoder layer of each direction is causally masked; the remaining
  ``n_layers-1`` layers attend *bidirectionally* over the whole current
  prefix (the reference passes ``slf_attn_mask=None`` there,
  decoder.py:145-158).
* cross-direction fusion after every layer:  with ``rev`` = reversal over the
  current prefix (position n <-> i-n):
    - ``fusion_mode='symmetric'``   (intended math, default):
        l2r' = l2r + rev(r2l);   r2l' = r2l + rev(l2r)
    - ``fusion_mode='reference_aliased'`` (bit-faithful to the reference's
      in-place buffer aliasing at decoder.py:132-143, where
      ``dec_output_left`` *aliases* ``dec_output_l2r`` so the second loop
      reads already-fused values):
        l2r' = l2r + rev(r2l);   r2l' = 2*r2l + rev(l2r)
* scheduled teacher forcing: ONE Bernoulli coin per step, shared by the whole
  batch and both directions (reference ``random.random() > 0.5``,
  decoder.py:176); gold token = ``ys_out_pad[:, i]``.
* targets are eos-padded to maxlen on *both* input and output sides
  (preprocess at decoder.py:62-77 pads gold with eos -- so the loss learns
  eos-after-eos; this differs from the unidirectional decoder which pads
  gold with IGNORE_ID).
* greedy ``recognize``: same scan body with argmax feedback, both directions
  simultaneously, never early-stopping (decoder.py:301-385).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import masks as M
from ..vocab import IGNORE_ID, SOS_ID, EOS_ID
from .layers import DecoderLayer, sinusoid_position_encoding

Array = jnp.ndarray


def preprocess_targets(labels: Array, maxlen: int, eos_id: int = EOS_ID) -> Array:
    """(B, P) IGNORE_ID-padded labels -> (B, maxlen) eos-padded gold.

    Vectorized equivalent of the reference ``preprocess`` + ``pad_list``
    (decoder.py:62-77, transformer/utils.py:1-9): valid tokens keep their
    position, everything after (incl. the appended eos) becomes eos.
    """
    B, P = labels.shape
    out = jnp.full((B, maxlen), eos_id, dtype=jnp.int32)
    valid = labels != IGNORE_ID
    take = min(P, maxlen)
    out = out.at[:, :take].set(
        jnp.where(valid[:, :take], labels[:, :take], eos_id).astype(jnp.int32))
    return out


def _fuse(h_a: Array, h_b: Array, step: Array, mode: str) -> Tuple[Array, Array]:
    """Cross-direction fusion over the current prefix [0..step].

    ``rev``: position n maps to step-n inside the prefix; positions beyond
    the prefix map to themselves (they are masked garbage either way).
    """
    L = h_a.shape[1]
    n = jnp.arange(L)
    idx = jnp.where(n <= step, step - n, n)[None, :, None]
    rev_a = jnp.take_along_axis(h_a, jnp.broadcast_to(idx, (h_a.shape[0], L, 1)), axis=1)
    rev_b = jnp.take_along_axis(h_b, jnp.broadcast_to(idx, (h_b.shape[0], L, 1)), axis=1)
    if mode == "symmetric":
        return h_a + rev_b, h_b + rev_a
    elif mode == "reference_aliased":
        return h_a + rev_b, 2.0 * h_b + rev_a
    raise ValueError(f"unknown fusion_mode: {mode}")


def _fuse_dual(h: Array, step: Array, mode: str) -> Array:
    """Direction-stacked fusion: h is (2, B, L, D) with dir 0 = l2r.

    symmetric:          h' = h + rev(h[::-1])
    reference_aliased:  l2r' = l2r + rev(r2l);  r2l' = 2*r2l + rev(l2r)
    (see _fuse for the per-direction derivation).
    """
    L = h.shape[2]
    n = jnp.arange(L)
    idx = jnp.where(n <= step, step - n, n)
    idx = jnp.broadcast_to(idx[None, None, :, None],
                           (2, h.shape[1], L, 1))
    rev = jnp.take_along_axis(h[::-1], idx, axis=2)
    if mode == "symmetric":
        return h + rev
    elif mode == "reference_aliased":
        scale = jnp.asarray([1.0, 2.0], h.dtype).reshape(2, 1, 1, 1)
        return h * scale + rev
    raise ValueError(f"unknown fusion_mode: {mode}")


class _SBLLayer(nn.Module):
    """One per-direction decoder layer: self-attn + cached cross-attn + FFN.
    Vmapped over the direction axis by _SBLStep so both directions' matmuls
    execute as single batched GEMMs with per-direction weights."""
    d_model: int
    n_head: int
    d_k: int
    d_v: int
    d_inner: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # Pallas decoder-layer megakernel on the deterministic path (all three
    # sublayers in one kernel, ops/decoder_layer.py); training keeps the
    # module composition (dropout + custom VJPs)
    use_fused_layer: bool = False
    fused_interpret: bool = False  # force interpret mode (CPU tests)

    def _fused_eligible(self, deterministic) -> bool:
        if not (self.use_fused_layer and deterministic
                and self.d_k == self.d_v
                # the kernel packs qkv/out biases and LN vectors into one
                # (13, d_model) tile and writes an (.., n_head*d_v) context
                # back into the d_model-wide residual stream
                and self.n_head * self.d_k == self.d_model):
            return False
        if self.is_initializing():
            return False  # params are created by the module path
        from ..ops.attention import available
        return available() or self.fused_interpret

    def _fused(self, h, kh, vh, slf_mask):
        from ..ops.decoder_layer import (fused_decoder_layer,
                                         layer_params_to_args)
        L = h.shape[1]
        bias = None
        if slf_mask is not None:
            # collapsing to (L, L) assumes a batch-invariant mask; the SBL
            # step only ever builds batch-dim-1 causal/prefix masks, but a
            # per-sample padding mask would silently mis-mask here
            assert slf_mask.shape[0] == 1, (
                "fused layer needs a batch-invariant self-attn mask; got "
                f"batch dim {slf_mask.shape[0]} — use the module path")
            bias = jnp.where(jnp.broadcast_to(slf_mask[0], (L, L)),
                             -1e9, 0.0).astype(jnp.float32)
        # CrossKV outputs are flat (B, Tk, H*d); the megakernel wants the
        # head-split layout (the relayout is loop-invariant and hoisted)
        B, Tk = kh.shape[0], kh.shape[1]
        ckh = kh.reshape(B, Tk, self.n_head, self.d_k)
        cvh = vh.reshape(B, Tk, self.n_head, self.d_v)
        return fused_decoder_layer(
            h, *layer_params_to_args(self.variables["params"]),
            ckh=ckh, cvh=cvh, mask_bias=bias,
            interpret=True if self.fused_interpret else None)

    @nn.compact
    def __call__(self, h, kh, vh, slf_mask, deterministic):
        from .layers import (CachedCrossAttention, MultiHeadAttention,
                             PositionwiseFeedForward)
        if self._fused_eligible(deterministic):
            return self._fused(h, kh, vh, slf_mask)
        h = MultiHeadAttention(
            self.d_model, self.n_head, self.d_k, self.d_v, self.dropout,
            self.dtype, self.use_pallas, name="slf")(
            h, h, h, mask=slf_mask, deterministic=deterministic)
        h = CachedCrossAttention(
            self.d_model, self.n_head, self.d_k, self.d_v, self.dropout,
            self.dtype, self.use_pallas, name="cross")(
            h, kh, vh, deterministic=deterministic)
        return PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout, self.dtype,
            name="ffn")(h, deterministic=deterministic)


class _SBLStep(nn.Module):
    """One decode step over BOTH directions at once: token buffers stack
    into a leading direction axis (2, B, L); every layer is an ``nn.vmap``
    over that axis (per-direction weights, shared embedding), so the whole
    step runs as batched GEMMs instead of two interleaved stacks.  Emits
    logits at position ``step`` and writes the next token at ``step+1``."""
    vocab_size: int
    d_model: int
    n_layers: int
    n_head: int
    d_k: int
    d_v: int
    d_inner: int
    dropout: float
    pe_maxlen: int
    fusion_mode: str
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_fused_layer: bool = False
    fused_interpret: bool = False

    @nn.compact
    def __call__(self, carry, enc_kv, deterministic, xs):
        """enc_kv: tuple of n_layers (kh, vh) pairs, each direction-stacked
        (2, B, Tk, H, d) -- computed ONCE outside the scan."""
        ys_l2r, ys_r2l = carry
        step, use_gold, gold_l2r_t, gold_r2l_t = xs
        B, L = ys_l2r.shape
        ys = jnp.stack([ys_l2r, ys_r2l])                # (2, B, L)

        # shared embedding (reference shares tgt_word_emb across directions,
        # decoder.py:43)
        embed = nn.Embed(self.vocab_size, self.d_model,
                         embedding_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype, name="tgt_word_emb")
        pe = jnp.asarray(sinusoid_position_encoding(self.pe_maxlen,
                                                    self.d_model)[:L])
        h = embed(ys) + pe.astype(self.dtype)
        h = nn.Dropout(self.dropout, name="emb_drop")(
            h, deterministic=deterministic)

        # first layer: causal AND restricted to the live prefix (keys<=step)
        causal = M.causal_mask(L)[None]                 # (1, L, L)
        beyond = (jnp.arange(L) > step)[None, None, :]  # (1, 1, L)
        first_mask = jnp.logical_or(causal, beyond)
        # remaining layers: bidirectional over the live prefix
        # (reference passes slf_attn_mask=None there, decoder.py:145-158)
        stack_mask = beyond

        dual_layer = nn.vmap(
            _SBLLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, 0, 0, None, None), out_axes=0, axis_size=2)

        def layer(i):
            return dual_layer(self.d_model, self.n_head, self.d_k, self.d_v,
                              self.d_inner, self.dropout, self.dtype,
                              self.use_pallas, self.use_fused_layer,
                              self.fused_interpret, name=f"layer_{i}")

        h = layer(0)(h, enc_kv[0][0], enc_kv[0][1], first_mask, deterministic)
        h = _fuse_dual(h, step, self.fusion_mode)
        for i in range(1, self.n_layers):
            h = layer(i)(h, enc_kv[i][0], enc_kv[i][1], stack_mask,
                         deterministic)
            h = _fuse_dual(h, step, self.fusion_mode)

        # untied per-direction output heads (reference decoder.py:59-60)
        dual_head = nn.vmap(
            nn.Dense, variable_axes={"params": 0},
            split_rngs={"params": True}, in_axes=0, out_axes=0, axis_size=2)
        last = jax.lax.dynamic_slice_in_dim(h, step, 1, axis=2)[:, :, 0]
        logits = dual_head(self.vocab_size, use_bias=False,
                           kernel_init=nn.initializers.xavier_uniform(),
                           dtype=self.dtype, name="tgt_word_prj")(
            last).astype(jnp.float32)                   # (2, B, V)

        gold = jnp.stack([gold_l2r_t, gold_r2l_t])      # (2, B)
        nxt = jnp.where(use_gold, gold,
                        jnp.argmax(logits, axis=-1)).astype(jnp.int32)
        ys_l2r = jax.lax.dynamic_update_slice_in_dim(
            ys_l2r, nxt[0][:, None], step + 1, axis=1)
        ys_r2l = jax.lax.dynamic_update_slice_in_dim(
            ys_r2l, nxt[1][:, None], step + 1, axis=1)
        return (ys_l2r, ys_r2l), (logits[0], logits[1])


class SBLDecoder(nn.Module):
    """Full synchronous bidirectional decoder."""
    vocab_size: int = 58
    d_model: int = 512
    n_layers: int = 6
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    d_inner: int = 2048
    dropout: float = 0.1
    pe_maxlen: int = 5000
    maxlen: int = 16
    fusion_mode: str = "symmetric"
    teacher_forcing_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # decoder-layer megakernel on deterministic (inference/eval) steps
    use_fused_layer: bool = False
    fused_interpret: bool = False
    # rematerialize each decode step in backward: the scan otherwise saves
    # 16 steps x 12 layers of (B, 17, d_inner) activations (~1.6 GB at the
    # reference batch 240)
    remat: bool = True
    # number of growing-buffer scan segments (see _segments); 1 = single
    # full-width scan
    decode_segments: int = 4
    # lax.scan unroll factor for the decode loop.  >1 lets XLA fuse
    # consecutive steps' parameter-gradient accumulator updates (the
    # backward's dW += dot(...) read-modify-write passes, ~21 ms/step of
    # f32 traffic at B=240) at the cost of a proportionally larger scan
    # body to compile.  1 = plain while loop (default).
    scan_unroll: int = 1
    # Hoist the params' f32->bf16 compute cast OUT of the decode scan
    # (nn.map_variables around the scanned module): the scan then broadcasts
    # bf16 weights and — the point — its backward accumulates the per-step
    # parameter cotangents in bf16, halving the dW read-modify-write HBM
    # traffic that dominates the decoder backward.  The bf16 sums are cast
    # back to f32 once after each scan.  Numerics: per-step dW contributions
    # round to bf16 before the (maxlen-step) accumulation — gate on
    # measurement.  Stored params stay f32 (init bypasses the transform).
    grad_accum_bf16: bool = False

    def _wrap_grad_accum(self, scan_cls):
        def to_bf16(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, tree)

        def to_f32(tree):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32)
                if a.dtype == jnp.bfloat16 else a, tree)

        return nn.map_variables(scan_cls, "params", trans_in_fn=to_bf16,
                                trans_out_fn=to_f32, init=False, mutable=True)

    def setup(self):
        step_cls = _SBLStep
        if self.remat:
            # deterministic (arg 3 incl. self) must stay static under remat
            step_cls = nn.remat(_SBLStep, static_argnums=(3,),
                                prevent_cse=False)
        scan_cls = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, 0),
            out_axes=0,
            unroll=self.scan_unroll,
        )
        # never wrap while initializing: with multiple segment calls the
        # second+ call would round-trip the just-created params through
        # trans_in/trans_out (f32 -> bf16 -> f32), silently quantizing the
        # init (caught by test_grad_accum_bf16_parity's bit-identity check)
        if self.grad_accum_bf16 and not self.is_initializing():
            scan_cls = self._wrap_grad_accum(scan_cls)
        self.step = scan_cls(
            self.vocab_size, self.d_model, self.n_layers, self.n_head,
            self.d_k, self.d_v, self.d_inner, self.dropout, self.pe_maxlen,
            self.fusion_mode, self.dtype, self.use_pallas,
            self.use_fused_layer, self.fused_interpret)
        # per-layer cross-attention K/V projections, hoisted OUT of the scan
        # so the encoder sequence is projected once per clip, not once per
        # decode step; vmapped over the direction axis (per-direction
        # weights, leading param dim 2)
        from .layers import CrossKV
        dual_kv = nn.vmap(CrossKV, variable_axes={"params": 0},
                          split_rngs={"params": True}, in_axes=None,
                          out_axes=0, axis_size=2)
        self.cross_kv = [
            dual_kv(self.d_model, self.n_head, self.d_k, self.d_v, self.dtype)
            for _ in range(self.n_layers)
        ]

    def _segments(self):
        """Split the decode into segments of growing buffer width.

        Step i only ever touches positions [0, i+1], so early steps can run
        on narrow token buffers: with 4 segments over 16 steps the per-step
        widths are 5/9/13/17 instead of a constant 17 -- ~35% less decode
        compute for identical results (verified by
        test_decode_segments_equivalent)."""
        k = max(1, min(self.decode_segments, self.maxlen))
        bounds = [round(self.maxlen * (i + 1) / k) for i in range(k)]
        out = []
        start = 0
        for b in bounds:
            if b > start:
                out.append((start, b))
                start = b
        return out

    def _run(self, enc_output: Array, gold_l2r: Array, gold_r2l: Array,
             use_gold: Array, deterministic: bool):
        B = enc_output.shape[0]
        L = self.maxlen + 1
        ys_l2r = jnp.full((B, L), SOS_ID, dtype=jnp.int32)
        ys_r2l = jnp.full((B, L), SOS_ID, dtype=jnp.int32)
        steps = jnp.arange(self.maxlen, dtype=jnp.int32)
        gl, gr = gold_l2r.T, gold_r2l.T               # (maxlen, B)
        enc = enc_output.astype(self.dtype)
        enc_kv = tuple(kv(enc) for kv in self.cross_kv)
        lg_l2r_parts, lg_r2l_parts = [], []
        for (a, b) in self._segments():
            Lseg = b + 1
            xs = (steps[a:b], use_gold[a:b], gl[a:b], gr[a:b])
            (seg_l2r, seg_r2l), (lg_l2r, lg_r2l) = self.step(
                (ys_l2r[:, :Lseg], ys_r2l[:, :Lseg]), enc_kv, deterministic,
                xs)
            ys_l2r = ys_l2r.at[:, :Lseg].set(seg_l2r)
            ys_r2l = ys_r2l.at[:, :Lseg].set(seg_r2l)
            lg_l2r_parts.append(lg_l2r)
            lg_r2l_parts.append(lg_r2l)
        lg_l2r = jnp.concatenate(lg_l2r_parts, axis=0)
        lg_r2l = jnp.concatenate(lg_r2l_parts, axis=0)
        # (maxlen, B, V) -> (B, maxlen, V)
        return (ys_l2r, ys_r2l,
                jnp.transpose(lg_l2r, (1, 0, 2)),
                jnp.transpose(lg_r2l, (1, 0, 2)))

    def __call__(self, labels_l2r: Array, labels_r2l: Array,
                 enc_output: Array, deterministic: bool = False):
        """Training forward (reference Decoder.forward, decoder.py:79-191).

        labels_*: (B, P) IGNORE_ID-padded targets (no sos/eos).
        Returns (pred_l2r, gold_l2r, pred_r2l, gold_r2l): logits (B, maxlen,
        V) and eos-padded gold (B, maxlen).
        """
        gold_l2r = preprocess_targets(labels_l2r, self.maxlen)
        gold_r2l = preprocess_targets(labels_r2l, self.maxlen)
        if deterministic:
            use_gold = jnp.zeros((self.maxlen,), dtype=bool)
        else:
            rng = self.make_rng("teacher")
            use_gold = jax.random.bernoulli(
                rng, self.teacher_forcing_rate, (self.maxlen,))
        _, _, lg_l2r, lg_r2l = self._run(enc_output, gold_l2r, gold_r2l,
                                         use_gold, deterministic)
        return lg_l2r, gold_l2r, lg_r2l, gold_r2l

    def recognize(self, enc_output: Array):
        """Greedy batched decode (reference recognize_beam, decoder.py:301-385).

        Returns (ys_l2r, ys_r2l): (B, maxlen+1) token ids incl. leading sos.
        """
        B = enc_output.shape[0]
        dummy_gold = jnp.full((B, self.maxlen), EOS_ID, dtype=jnp.int32)
        use_gold = jnp.zeros((self.maxlen,), dtype=bool)
        ys_l2r, ys_r2l, _, _ = self._run(enc_output, dummy_gold, dummy_gold,
                                         use_gold, True)
        return ys_l2r, ys_r2l

    def compute_cross_kv(self, enc_output: Array):
        """Public per-layer cross-attention K/V precompute for search
        drivers (decode/beam.py): tuple of n_layers direction-stacked
        (kh, vh) pairs."""
        enc = enc_output.astype(self.dtype)
        return tuple(kv(enc) for kv in self.cross_kv)

    def step_logits_cached(self, ys_l2r: Array, ys_r2l: Array, enc_kv,
                           step: Array) -> Tuple[Array, Array]:
        """Both directions' logits at position ``step`` given paired token
        buffers (N, L) and precomputed cross K/V.

        Building block for the bidirectional beam search: runs the SAME
        scan module as training/greedy decode for a single step (the scan
        broadcasts params, so a one-step xs reuses the identical weights
        and per-step fusion coupling), discarding its argmax buffer write.
        """
        N = ys_l2r.shape[0]
        step = jnp.asarray(step, jnp.int32)
        dummy = jnp.full((1, N), EOS_ID, jnp.int32)
        xs = (step[None], jnp.zeros((1,), bool), dummy, dummy)
        (_, _), (lg_l2r, lg_r2l) = self.step((ys_l2r, ys_r2l), enc_kv, True,
                                             xs)
        return lg_l2r[0], lg_r2l[0]
