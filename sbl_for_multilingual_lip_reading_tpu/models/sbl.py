"""Top-level seq2seq models: frontend -> encoder -> decoder.

Rewrites of the reference ``Transformer`` wrappers
(SBL_Multilingual_Lip_reading/transformer/transformer.py:5-69 and the
per-project variants).  The reference's ``unsqueeze(4).permute(0,4,1,2,3)``
channel plumbing disappears: video enters channels-last as (B, T, H, W) or
(B, T, H, W, 1) and stays that way.

Note on initialization parity: the reference re-initializes *every* dim>1
parameter with Xavier-uniform at Transformer construction
(transformer.py:18-20), clobbering the frontend's He init (and any
``visual_frontend(pt)`` pretrained load that happened in ``__init__``).  We
keep the intended per-module inits (He for convs, Xavier for transformer
matrices) -- the clobbering is a reference bug, documented here for the
parity audit.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .decoder_sbl import SBLDecoder
from .decoder_uni import UniDecoder
from .encoder import Encoder
from .frontend import VisualFrontend

Array = jnp.ndarray


def _ensure_channels(x: Array) -> Array:
    """(B, T, H, W) -> (B, T, H, W, 1)."""
    if x.ndim == 4:
        x = x[..., None]
    return x


class SBLTransformer(nn.Module):
    """Synchronous bidirectional multilingual lip-reading model (headline)."""
    frontend: VisualFrontend
    encoder: Encoder
    decoder: SBLDecoder

    def _encode(self, video: Array, train: bool) -> Array:
        x = _ensure_channels(video)
        feats = self.frontend(x, train=train, deterministic=not train)
        return self.encoder(feats, deterministic=not train)

    def __call__(self, video: Array, labels_l2r: Array, labels_r2l: Array,
                 train: bool = True):
        """Training forward.  video: (B, T, H, W[, 1]) normalized grayscale;
        labels: (B, P) IGNORE-padded phoneme ids.
        Returns (pred_l2r, gold_l2r, pred_r2l, gold_r2l)."""
        enc = self._encode(video, train)
        return self.decoder(labels_l2r, labels_r2l, enc,
                            deterministic=not train)

    def recognize(self, video: Array) -> Tuple[Array, Array]:
        """Greedy bidirectional decode (reference transformer.py:45-69).
        Returns (ys_l2r, ys_r2l): (B, maxlen+1) ids with leading sos."""
        enc = self._encode(video, train=False)
        return self.decoder.recognize(enc)

    def encode(self, video: Array) -> Array:
        """Expose encoder outputs (for beam search drivers)."""
        return self._encode(video, train=False)


class UniTransformer(nn.Module):
    """Unidirectional seq2seq model (LRW / LRW-1000 workloads)."""
    frontend: VisualFrontend
    encoder: Encoder
    decoder: UniDecoder

    def _encode(self, video: Array, train: bool) -> Array:
        x = _ensure_channels(video)
        feats = self.frontend(x, train=train, deterministic=not train)
        return self.encoder(feats, deterministic=not train)

    def __call__(self, video: Array, labels: Array, train: bool = True):
        enc = self._encode(video, train)
        return self.decoder(labels, enc, deterministic=not train)

    def recognize(self, video: Array, maxlen: Optional[int] = None) -> Array:
        enc = self._encode(video, train=False)
        return self.decoder.recognize_greedy(enc, maxlen=maxlen)

    def encode(self, video: Array) -> Array:
        """Expose encoder outputs (for beam search drivers)."""
        return self._encode(video, train=False)
