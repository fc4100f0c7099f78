"""Real-data datasets: LRW npy clips and LRW-1000 jpg frame dirs.

Mixed bilingual dataset matching the reference ``AiShellDataset`` contract
(SBL_Multilingual_Lip_reading/data_gen.py:127-322) but restructured for
throughput on a mostly-idle host:

* LRW clips stay **uint8** end-to-end on the host (the reference converts to
  float64 at load via ``/255`` then crops in python, data_gen.py:122-125);
  normalization/crop/flip run on-device (see data/pipeline.py).
* the LRW-1000 silence probe and label filtering are offline
  (data/manifest.py), not per-construction work.
* labels are precomputed once per word/pinyin (closed sets), not per sample.

Returned sample dict matches SyntheticLipDataset so the two are
interchangeable throughout training/eval.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np

from ..vocab import (IGNORE_ID, LRW_PHONEMES, LRW1000_PHONEMES,
                     encode_english_word, encode_pinyin_seq,
                     pinyin_to_phonemes, word_to_phonemes, words_1500)
from .manifest import Lrw1000Entry, read_manifest
from .synthetic import _LRW_RESPELL, _pad_labels


def encode_word_ids(word: str, vocab: str = "sbl"):
    """English word -> phoneme ids in the requested token table: 'sbl' =
    unified 58-token vocab (SBL project), 'lrw' = the LRW project's own
    42-token table, which spells two phonemes differently
    (VSR_seq2seq_Transformer_with_phonemes_LRW/English_phonemes_total.py)."""
    if vocab == "lrw":
        phs = [_LRW_RESPELL.get(p, p) for p in word_to_phonemes(word)]
        return [LRW_PHONEMES.index(p) for p in phs]
    return encode_english_word(word)


def encode_pinyin_ids(pinyins, vocab: str = "sbl"):
    """Pinyin sequence -> phoneme ids: 'sbl' = unified 58-token vocab,
    'lrw1000' = the Mandarin project's 48-token table
    (VSR_seq2seq_Transformer_with_phonemes_LRW1000/pinyin2phoneme)."""
    if vocab == "lrw1000":
        return [LRW1000_PHONEMES.index(p) for p in pinyin_to_phonemes(pinyins)]
    return encode_pinyin_seq(pinyins)

try:
    import cv2
except Exception:  # pragma: no cover - cv2 present in this image
    cv2 = None

_WORD_INDEX: Optional[Dict[str, int]] = None


def word_class_id(word: str) -> int:
    """1500-way classify label: index into words_1500.txt (LRW words occupy
    [0, 500), LRW-1000 pinyin strings [500, 1500)) -- the reference's
    ``label = words.index(item)`` (classify data_gen.py:161,174).  Unknown
    words map to -1 (never matches an argmax) rather than the reference's
    ValueError crash."""
    global _WORD_INDEX
    if _WORD_INDEX is None:
        _WORD_INDEX = {w: i for i, w in enumerate(words_1500())}
    return _WORD_INDEX.get(word, -1)


class LrwDataset:
    """LRW word clips stored as (29, 96, 96) uint8-convertible .npy files,
    one directory per word with train/val/test splits
    (reference data_gen.py:137-151: ``<root>/<WORD>/<split>/<WORD>_*.npy``)."""

    def __init__(self, root: str, split: str = "train", frames: int = 30,
                 pad_len: int = 14, data_fraction: float = 1.0,
                 vocab: str = "sbl"):
        self.frames = frames
        self.pad_len = pad_len
        self.samples: List[tuple] = []
        label_cache: Dict[str, np.ndarray] = {}
        for fold in sorted(glob.glob(os.path.join(root, "*"))):
            files = sorted(glob.glob(os.path.join(fold, split, "*.npy")))
            files = files[:int(len(files) * data_fraction)]
            for f in files:
                word = os.path.basename(f).split("_")[0]
                if word not in label_cache:
                    ids = encode_word_ids(word, vocab)
                    label_cache[word] = (
                        _pad_labels(ids, pad_len),
                        _pad_labels(ids[::-1], pad_len),
                        np.int32(word_class_id(word)))
                self.samples.append((f, word))
        self._labels = label_cache

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        path, word = self.samples[i]
        arr = np.load(path)
        if arr.dtype != np.uint8:
            # stored floats in [0,1] or [0,255]
            arr = (arr * 255.0).astype(np.uint8) if arr.max() <= 1.0 \
                else arr.astype(np.uint8)
        clip = np.zeros((self.frames,) + arr.shape[1:], dtype=np.uint8)
        n = min(len(arr), self.frames)
        clip[:n] = arr[:self.frames]
        labels, labels_rev, word_id = self._labels[word]
        return {"clip_u8": clip, "labels": labels,
                "labels_reverse": labels_rev, "lang_id": np.int32(0),
                "word_id": word_id, "n_frames": np.int32(n)}

    def labels_only(self, i: int) -> np.ndarray:
        """Label ids without touching pixel data (corpus scans, e.g. the
        bigram-LM builder, must not pay a clip decode per sample)."""
        return self._labels[self.samples[i][1]][0]


class Lrw1000Dataset:
    """LRW-1000 clips as jpg frame directories + a (clean) manifest
    (reference load_images, data_gen.py:59-97): frames ``{st..ed}.jpg``
    resized to raw_size, clamped to ``frames`` frames, zero-padded."""

    def __init__(self, images_root: str, manifest_path: str,
                 frames: int = 30, raw_size: int = 96, pad_len: int = 14,
                 limit: Optional[int] = None, wav_root: Optional[str] = None,
                 audio_dim: int = 80, lfr_m: int = 4, lfr_n: int = 3,
                 audio_pad_frames: int = 88, vocab: str = "sbl"):
        """wav_root: when given, samples also carry 80-dim log-mel fbank
        features with LFR stacking (the audio stream of the reference's
        audio-visual variants, data_gen_LRW1000.py + utils.py:199-233),
        zero-padded to ``audio_pad_frames`` LFR frames."""
        if cv2 is None:
            raise RuntimeError("cv2 required for LRW-1000 jpg decoding")
        self.images_root = images_root
        self.frames = frames
        self.raw = raw_size
        self.pad_len = pad_len
        self.wav_root = wav_root
        self.audio_dim = audio_dim
        self.lfr_m, self.lfr_n = lfr_m, lfr_n
        self.audio_pad_frames = audio_pad_frames
        self.vocab = vocab
        self.entries: List[Lrw1000Entry] = read_manifest(manifest_path,
                                                         limit=limit)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        e = self.entries[i]
        st, ed = e.start_frame, e.end_frame
        if ed > st + self.frames:
            ed = st + self.frames
        if st == ed:
            ed = st + 1
        clip = np.zeros((self.frames, self.raw, self.raw), dtype=np.uint8)
        t = 0
        for fr in range(st, ed):
            path = os.path.join(self.images_root, e.img_dir, f"{fr}.jpg")
            if not os.path.exists(path):
                continue
            img = cv2.imread(path)
            if img is None:
                continue
            img = cv2.resize(img, (self.raw, self.raw))
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
            clip[t] = img
            t += 1
        ids = encode_pinyin_ids(e.pinyins, self.vocab)
        out = {"clip_u8": clip, "labels": _pad_labels(ids, self.pad_len),
               "labels_reverse": _pad_labels(ids[::-1], self.pad_len),
               "lang_id": np.int32(1),
               "word_id": np.int32(word_class_id(" ".join(e.pinyins))),
               "n_frames": np.int32(t)}
        if self.wav_root is not None:
            out["audio"] = self._load_audio(e)
        return out

    def labels_only(self, i: int) -> np.ndarray:
        """Label ids without decoding any jpg frames."""
        ids = encode_pinyin_ids(self.entries[i].pinyins, self.vocab)
        return _pad_labels(ids, self.pad_len)

    def _load_audio(self, e: Lrw1000Entry) -> np.ndarray:
        """(audio_pad_frames, audio_dim * lfr_m) fbank+LFR features."""
        from .audio import build_lfr_features, extract_fbank
        import wave
        d = self.audio_dim * self.lfr_m
        out = np.zeros((self.audio_pad_frames, d), dtype=np.float32)
        path = os.path.join(self.wav_root, e.wav_id + ".wav")
        try:
            with wave.open(path, "rb") as w:
                sr = w.getframerate()
                raw = w.readframes(w.getnframes())
            y = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            if len(y) == 0:
                return out
            feat = extract_fbank(y, sr=sr, dim=self.audio_dim)
            feat = build_lfr_features(feat, self.lfr_m, self.lfr_n)
            n = min(len(feat), self.audio_pad_frames)
            out[:n] = feat[:n]
        except (OSError, wave.Error):
            pass
        return out


class MixedBilingualDataset:
    """LRW + LRW-1000 concatenation (the SBL 'all' kind, data_gen.py:128)."""

    def __init__(self, lrw: LrwDataset, lrw1000: Lrw1000Dataset):
        self.lrw = lrw
        self.lrw1000 = lrw1000

    def __len__(self):
        return len(self.lrw) + len(self.lrw1000)

    def __getitem__(self, i: int):
        if i < len(self.lrw):
            return self.lrw[i]
        return self.lrw1000[i - len(self.lrw)]

    def labels_only(self, i: int) -> np.ndarray:
        if i < len(self.lrw):
            return self.lrw.labels_only(i)
        return self.lrw1000.labels_only(i - len(self.lrw))

    def stream_indices(self):
        """(primary LRW indices, secondary LRW-1000 indices) for the
        fixed-ratio TwoStreamBatchSampler (reference train.py:83-90 builds
        the streams with get_lrw_labeled_and_lrw1000_labeled_idxs)."""
        n = len(self.lrw)
        return list(range(n)), list(range(n, n + len(self.lrw1000)))
