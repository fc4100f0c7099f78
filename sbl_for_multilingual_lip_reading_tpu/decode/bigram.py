"""Bigram language-model bias for beam search.

The reference loads a pre-built ``bigram_freq.pkl`` mapping last-token-id ->
frequency vector over the vocab and adds ``log(freq)`` to each step's
log-probs (VSR_seq2seq_Transformer_with_phonemes_LRW1000/transformer/
decoder.py:12-15, 162-191).  The pickle is missing from the repo; this module
regenerates the table from training label sequences from first principles
(SURVEY.md §7 "missing runtime artifacts").

``floor`` controls unseen-bigram mass: the reference's raw-frequency log
yields -inf for unseen pairs (hard pruning); floor>0 softens that.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from ..vocab import EOS_ID, SOS_ID


def build_bigram_matrix(sequences: Iterable[Sequence[int]], vocab_size: int,
                        floor: float = 0.0,
                        normalize: bool = True) -> np.ndarray:
    """Count transitions over (sos, y_0..y_n, eos) chains.

    Returns (V, V) float32 ``freq`` with freq[last, next]; rows normalized to
    probabilities when ``normalize``.  Use ``np.log(freq)`` as the beam bias.
    """
    counts = np.zeros((vocab_size, vocab_size), dtype=np.float64)
    for seq in sequences:
        chain = [SOS_ID] + [int(t) for t in seq] + [EOS_ID]
        for a, b in zip(chain[:-1], chain[1:]):
            counts[a, b] += 1.0
    counts += floor
    if normalize:
        row = counts.sum(axis=1, keepdims=True)
        row[row == 0] = 1.0
        counts = counts / row
    return counts.astype(np.float32)


def bigram_from_dataset(dataset, vocab_size: int, ignore_id: int = -1,
                        floor: float = 1e-6) -> np.ndarray:
    """Build the bigram table from any dataset yielding 'labels' arrays.

    Prefers the dataset's ``labels_only(i)`` accessor when present:
    ``__getitem__`` on the real loaders decodes a full clip (up to 30 jpg
    reads on LRW-1000) per sample, which a corpus scan over the train
    manifest must not pay."""
    get = getattr(dataset, "labels_only", None)
    if get is None:
        def get(i):
            return dataset[i]["labels"]

    def seqs():
        for i in range(len(dataset)):
            lab = np.asarray(get(i))
            yield lab[lab != ignore_id]
    return build_bigram_matrix(seqs(), vocab_size, floor=floor)
