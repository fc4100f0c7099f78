"""Synthetic clip dataset: CPU-runnable stand-in for LRW / LRW-1000.

The real datasets are licensed and absent from this image (the reference
assumes ``roi_80_116_175_211_npy_gray`` npy trees etc., config.py:39-46).
This dataset fabricates deterministic uint8 clips with *known* phoneme
targets drawn from the real vocab tables, so every train/eval path --
including WER/PER scoring -- runs end-to-end on any backend
(SURVEY.md §4: "synthetic-clip fake dataset ... so train/eval run CPU-only").

Each index deterministically selects a word:
* even indices -> an LRW English word (label via the ARPABET table)
* odd indices  -> an LRW-1000 pinyin entry (label via the pinyin table)
matching the mixed bilingual AiShellDataset contract
(SBL data_gen.py:270-304): returns raw uint8 frames plus IGNORE-padded
labels, reversed labels, and the language id.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..vocab import (IGNORE_ID, LRW_PHONEMES, LRW1000_PHONEMES,
                     TOTAL_PHONEMES, chinese_phoneme_map,
                     encode_english_word, encode_pinyin_seq,
                     pinyin_to_phonemes, word_to_phonemes, lrw_words,
                     lrw1000_words, words_1500)

# the LRW project's 42-token vocab spells two phonemes differently from the
# unified table (English_phonemes_total.py: 'ing' vs 'ng', 'a2' vs 'a1')
_LRW_RESPELL = {"ng": "ing", "a1": "a2"}


def _pad_labels(ids, pad_len: int) -> np.ndarray:
    out = np.full((pad_len,), IGNORE_ID, dtype=np.int32)
    ids = ids[:pad_len]
    out[:len(ids)] = ids
    return out


class SyntheticLipDataset:
    """Indexable dataset of synthetic raw clips.

    Returns dict with:
      clip_u8:        (frames, raw, raw) uint8
      labels:         (pad_len,) int32, IGNORE-padded phoneme ids
      labels_reverse: (pad_len,) int32
      lang_id:        () int32 (0 = LRW/English, 1 = LRW-1000/Mandarin)
      word_id:        () int32 index into the 1500-word list (classify)
    """

    def __init__(self, size: int = 64, frames: int = 30, raw_size: int = 96,
                 pad_len: int = 14, kind: str = "all", seed: int = 0,
                 vocab: str = "sbl"):
        """vocab: which token table labels use -- 'sbl' (58, unified),
        'lrw' (42, English project), 'lrw1000' (48, Mandarin project)."""
        assert kind in ("all", "lrw", "lrw1000")
        assert vocab in ("sbl", "lrw", "lrw1000")
        self.size = size
        self.frames = frames
        self.raw = raw_size
        self.pad_len = pad_len
        self.kind = kind
        self.vocab = vocab
        self.seed = seed
        self._lrw = lrw_words()
        self._lrw1000 = [w for w in lrw1000_words()
                         if all(s in chinese_phoneme_map()
                                for s in w.split(" "))]

    def __len__(self):
        return self.size

    def _is_lrw(self, i: int) -> bool:
        if self.kind == "lrw":
            return True
        if self.kind == "lrw1000":
            return False
        return i % 2 == 0

    def stream_indices(self):
        """(LRW indices, LRW-1000 indices) for TwoStreamBatchSampler tests
        (only meaningful for kind='all', where even=LRW / odd=LRW-1000)."""
        idx = list(range(self.size))
        return ([i for i in idx if self._is_lrw(i)],
                [i for i in idx if not self._is_lrw(i)])

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 1000003 + i)
        clip = rng.integers(0, 256, size=(self.frames, self.raw, self.raw),
                            dtype=np.uint8)
        if self._is_lrw(i):
            word = self._lrw[i % len(self._lrw)]
            if self.vocab == "lrw":
                phs = [_LRW_RESPELL.get(p, p) for p in word_to_phonemes(word)]
                ids = [LRW_PHONEMES.index(p) for p in phs]
            else:
                ids = encode_english_word(word)
            lang = 0
            word_id = self._lrw.index(word)
        else:
            word = self._lrw1000[i % len(self._lrw1000)]
            if self.vocab == "lrw1000":
                ids = [LRW1000_PHONEMES.index(p)
                       for p in pinyin_to_phonemes(word.split(" "))]
            else:
                ids = encode_pinyin_seq(word.split(" "))
            lang = 1
            try:
                word_id = 500 + words_1500()[500:].index(word)
            except ValueError:
                word_id = 500
        return {
            "clip_u8": clip,
            "labels": _pad_labels(ids, self.pad_len),
            "labels_reverse": _pad_labels(ids[::-1], self.pad_len),
            "lang_id": np.int32(lang),
            "word_id": np.int32(word_id),
            "n_frames": np.int32(self.frames),
        }


class SyntheticPatternDataset:
    """LEARNABLE synthetic set: pixels deterministically encode the word.

    ``SyntheticLipDataset`` clips are pure per-index noise -- a model can
    only memorize them.  Here every word gets a low-frequency spatiotemporal
    base pattern (seeded by the word), and each sample is that pattern plus
    per-sample noise, so a trained model generalizes to HELD-OUT clips of
    the same words.  Used by ``tools/convergence_check.py --full-dims`` to
    demonstrate full-dims convergence on a non-degenerate task without the
    licensed datasets (the reference's 3-stage recipe, README.md:46-68,
    assumes LRW/LRW-1000).

    split: 'train' and 'heldout' draw disjoint per-sample noise seeds.
    """

    def __init__(self, n_words: int = 200, samples_per_word: int = 25,
                 frames: int = 30, raw_size: int = 96, pad_len: int = 14,
                 seed: int = 0, noise: float = 0.25, split: str = "train",
                 cache: bool = True):
        assert split in ("train", "heldout")
        self.n_words = n_words
        self.spw = samples_per_word
        self.frames = frames
        self.raw = raw_size
        self.pad_len = pad_len
        self.seed = seed
        self.noise = noise
        self.split = split
        # cache fully-built samples: regenerating per-clip gaussian noise in
        # python throttled full-dims training to ~75 clips/s on this 1-core
        # host (vs the chip's ~400+); 5k cached uint8 clips are ~1.4 GB
        self._sample_cache: Dict[int, Dict[str, np.ndarray]] = {} \
            if cache else None
        lrw = lrw_words()
        l1000 = [w for w in lrw1000_words()
                 if all(s in chinese_phoneme_map() for s in w.split(" "))]
        # alternate languages, mirroring the mixed bilingual corpus
        self.words = []
        for i in range(n_words):
            if i % 2 == 0:
                self.words.append(("en", lrw[(i // 2) % len(lrw)]))
            else:
                self.words.append(("zh", l1000[(i // 2) % len(l1000)]))
        self._patterns: Dict[int, np.ndarray] = {}

    def __len__(self):
        return self.n_words * self.spw

    def _pattern(self, w: int) -> np.ndarray:
        """(frames, raw, raw) float32 in [0,1]: blocky low-freq video unique
        to word w (8x8 spatial blocks, smooth in time)."""
        if w not in self._patterns:
            rng = np.random.default_rng(77777 + self.seed * 131 + w)
            small = rng.random((self.frames, self.raw // 8, self.raw // 8))
            base = np.kron(small, np.ones((1, 8, 8))).astype(np.float32)
            self._patterns[w] = base
        return self._patterns[w]

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self._sample_cache is not None and i in self._sample_cache:
            return self._sample_cache[i]
        out = self._build(i)
        if self._sample_cache is not None:
            self._sample_cache[i] = out
        return out

    def _build(self, i: int) -> Dict[str, np.ndarray]:
        w = i % self.n_words
        offset = 10 ** 7 if self.split == "heldout" else 0
        rng = np.random.default_rng(self.seed * 1000003 + offset + i)
        base = self._pattern(w)
        clip = base + self.noise * rng.standard_normal(base.shape)
        clip = np.clip(clip * 255.0, 0, 255).astype(np.uint8)
        lang, word = self.words[w]
        if lang == "en":
            ids = encode_english_word(word)
            lang_id = 0
            words = lrw_words()
            word_id = words.index(word) if word in words else -1
        else:
            ids = encode_pinyin_seq(word.split(" "))
            lang_id = 1
            try:
                word_id = 500 + words_1500()[500:].index(word)
            except ValueError:
                word_id = -1
        return {
            "clip_u8": clip,
            "labels": _pad_labels(ids, self.pad_len),
            "labels_reverse": _pad_labels(ids[::-1], self.pad_len),
            "lang_id": np.int32(lang_id),
            "word_id": np.int32(word_id),
            "n_frames": np.int32(self.frames),
        }
