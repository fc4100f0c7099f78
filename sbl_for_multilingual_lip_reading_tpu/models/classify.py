"""Stage-1 pretraining model: frontend + encoder + classification heads.

Rewrite of the reference classify Transformer
(VSR_visual_frontend_pretraining_on_LRW_LRW1000_classify/transformer/
transformer.py:6-37): a 1500-way word head over pooled encoder features and a
2-way language-ID head over the extra appended frame slot ``[:, 30, :]``
(clips are padded to 31 frames, reference data_gen.py:237).

Parity note: the reference pools with ``torch.mean(x, dim=2, keepdim=True)``
(transformer.py:31) -- reducing the *feature* axis to width 1 and feeding a
(N, 31, 1) tensor into a 512-in Linear, a latent crash / broadcasting bug.
The documented intent (and what the shipped ``.pt`` checkpoints imply) is
time pooling; we implement ``mean over dim=1``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .encoder import Encoder
from .frontend import VisualFrontend
from .sbl import _ensure_channels

Array = jnp.ndarray


class ClassifyTransformer(nn.Module):
    frontend: VisualFrontend
    encoder: Encoder
    num_word_classes: int = 1500
    num_languages: int = 2
    language_slot: int = 30   # the padded 31st frame carries language identity

    @nn.compact
    def __call__(self, video: Array, train: bool = True):
        """video: (B, 31, H, W[, 1]).  Returns (word_logits (B, 1500),
        language_logits (B, 2))."""
        x = _ensure_channels(video)
        feats = self.frontend(x, train=train, deterministic=not train)
        enc = self.encoder(feats, deterministic=not train)
        pooled = jnp.mean(enc, axis=1)            # time pooling (intended)
        lang_feat = enc[:, self.language_slot, :]
        word_logits = nn.Dense(self.num_word_classes,
                               kernel_init=nn.initializers.xavier_uniform(),
                               name="fc_word")(pooled).astype(jnp.float32)
        lang_logits = nn.Dense(self.num_languages,
                               kernel_init=nn.initializers.xavier_uniform(),
                               name="fc_lang")(lang_feat).astype(jnp.float32)
        return word_logits, lang_logits
