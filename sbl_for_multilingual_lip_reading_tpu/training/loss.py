"""Loss functions.

Rewrite of the reference ``cal_performance`` / ``cal_loss``
(SBL_Multilingual_Lip_reading/transformer/loss.py:7-52): label-smoothed
cross-entropy with IGNORE_ID masking, mean over non-pad tokens, plus the
correct-token count.  The reference's one-hot/scatter construction becomes a
closed-form smoothed CE; numerics match exactly (see tests/test_loss.py):

    one_hot*(1-eps) + (1-one_hot)*eps/C      (loss.py:43)

Note the reference's smoothing mass is ``eps/C`` on *every* off-target class
(not the textbook eps/(C-1)) -- reproduced as-is.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..vocab import IGNORE_ID

Array = jnp.ndarray


def label_smoothed_ce(pred: Array, gold: Array, smoothing: float = 0.0) -> Array:
    """pred: (..., C) raw logits; gold: (...,) int ids with IGNORE_ID padding.
    Returns scalar mean loss over non-ignored tokens."""
    C = pred.shape[-1]
    pred = pred.astype(jnp.float32)
    logp = jax.nn.log_softmax(pred, axis=-1)
    mask = gold != IGNORE_ID
    safe_gold = jnp.where(mask, gold, 0)
    if smoothing > 0.0:
        eps = smoothing
        # sum over classes of target_dist * logp, with target dist
        # (1-eps)+eps/C on the gold class and eps/C elsewhere
        gold_logp = jnp.take_along_axis(logp, safe_gold[..., None],
                                        axis=-1)[..., 0]
        off_gold = jnp.sum(logp, axis=-1) - gold_logp
        nll = -((1.0 - eps) * gold_logp + (eps / C) * off_gold)
    else:
        nll = -jnp.take_along_axis(logp, safe_gold[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / n


def cal_performance(pred: Array, gold: Array,
                    smoothing: float = 0.0) -> Tuple[Array, Array]:
    """(loss, n_correct) -- reference cal_performance (loss.py:7-24).
    pred: (B, T, C); gold: (B, T)."""
    loss = label_smoothed_ce(pred, gold, smoothing)
    mask = gold != IGNORE_ID
    correct = (jnp.argmax(pred, axis=-1) == gold) & mask
    return loss, jnp.sum(correct)


def classify_loss(word_logits: Array, word_labels: Array,
                  lang_logits: Array, lang_labels: Array,
                  language_weight: float = 0.1) -> Tuple[Array, Array, Array]:
    """Joint word + language CE (reference classify/train.py:127-130).
    Returns (total_loss, word_correct, lang_correct).

    Samples with label < 0 (``word_class_id``'s unknown-word sentinel) are
    EXCLUDED from loss and accuracy: ``take_along_axis`` would otherwise
    wrap -1 to the last class and actively train toward it."""
    def ce(logits, labels):
        valid = labels >= 0
        safe = jnp.where(valid, labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(jnp.where(valid, nll, 0.0)) / n
    loss = ce(word_logits, word_labels) + language_weight * ce(lang_logits,
                                                               lang_labels)
    w_ok = jnp.sum((jnp.argmax(word_logits, -1) == word_labels)
                   & (word_labels >= 0))
    l_ok = jnp.sum((jnp.argmax(lang_logits, -1) == lang_labels)
                   & (lang_labels >= 0))
    return loss, w_ok, l_ok
