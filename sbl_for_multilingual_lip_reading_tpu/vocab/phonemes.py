"""Unified cross-lingual phoneme vocabulary (L1 of the stack).

Rebuilds the reference's vocab/G2P layer (see
/root/reference/SBL_Multilingual_Lip_reading/data_gen.py:22-43 and
generate_phonemes.py:1-56) as a pure-Python, dependency-free module:

* ``TOTAL_PHONEMES`` -- the 58-token unified vocabulary (56 phonemes +
  sos/eos) used by the SBL multilingual model (reference data_gen.py:43).
* ``LRW_PHONEMES`` -- the 42-token English vocabulary used by the LRW
  seq2seq project (reference
  VSR_seq2seq_Transformer_with_phonemes_LRW/English_phonemes_total.py:1).
* ``LRW1000_PHONEMES`` -- the 48-token Mandarin vocabulary used by the
  LRW-1000 seq2seq project (reference
  VSR_seq2seq_Transformer_with_phonemes_LRW1000/data_gen.py:20).
* English word -> phoneme-id sequence via a precomputed ARPABET table
  (replacing the reference's runtime g2p_en call, data_gen.py:143-146 --
  the 500 LRW words are a closed set so the table is shipped as data).
* Pinyin syllable -> phoneme-id sequence via the chinese_phonemes table
  (reference data_gen.py:33-41).

Token-id conventions match the reference exactly: sos=0, eos=1,
IGNORE_ID=-1 (reference config.py:25-27).
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Sequence

IGNORE_ID = -1
SOS_ID = 0
EOS_ID = 1

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")

# The canonical 58-token unified vocabulary, exactly as hardcoded in the
# reference (SBL_Multilingual_Lip_reading/data_gen.py:43).  Index == token id.
TOTAL_PHONEMES: List[str] = [
    "sos", "eos", "s", "p", "ii", "k", "i", "ng", "l", "e", "v", "e1",
    "a1", "m", "z", "zh", "o", "r", "eu", "t", "ai", "h", "th", "y", "n",
    "ch", "ae", "au", "er", "d", "f", "ei", "w", "a", "oi", "b", "uu",
    "g", "sh", "dh", "u", "zh1", "an", "ang", "en", "eng", "ie", "in",
    "ing", "uo", "ts", "iii", "ong", "j", "yu", "yue", "q", "x",
]

# 42-token English-only vocabulary of the LRW seq2seq project (reference
# English_phonemes_total.py:1).  Note its idiosyncrasies vs TOTAL_PHONEMES:
# it uses 'ing' where SBL uses 'ng' and 'a2' where SBL uses 'a1'.
LRW_PHONEMES: List[str] = [
    "<sos>", "<eos>", "s", "p", "ii", "k", "i", "ing", "l", "e", "v",
    "e1", "a2", "m", "z", "zh", "o", "r", "eu", "t", "ai", "h", "th",
    "y", "n", "ch", "ae", "au", "er", "d", "f", "ei", "w", "a", "oi",
    "b", "uu", "g", "sh", "dh", "u", "zh1",
]

# 48-token Mandarin-only vocabulary of the LRW-1000 seq2seq project
# (reference VSR_seq2seq_Transformer_with_phonemes_LRW1000/data_gen.py:20).
LRW1000_PHONEMES: List[str] = [
    "sos", "eos", "s", "au", "m", "i", "p", "ii", "t", "q", "yu", "x",
    "j", "an", "y", "eu", "sh", "iii", "d", "ong", "ang", "zh", "l",
    "e1", "f", "g", "eng", "ts", "uo", "a", "ch", "w", "en", "h", "u",
    "ai", "yue", "uu", "in", "ing", "ei", "z", "b", "zh1", "k", "ie",
    "er", "n",
]


def _read_lines(name: str) -> List[str]:
    with open(os.path.join(_ASSETS, name), "r") as f:
        return [ln.rstrip("\n") for ln in f if ln.strip()]


@functools.lru_cache(None)
def english_phoneme_map() -> Dict[str, str]:
    """ARPABET (with stress digit) -> unified phoneme symbol.

    Parses assets/english_phonemes.txt (data table ported verbatim from the
    reference; parsing mirrors data_gen.py:25-31).
    """
    out: Dict[str, str] = {}
    for line in _read_lines("english_phonemes.txt"):
        items = line.split(" ")
        if len(items) >= 2:
            out[items[0]] = items[1]
    return out


@functools.lru_cache(None)
def chinese_phoneme_map() -> Dict[str, List[str]]:
    """Pinyin syllable -> list of unified phoneme symbols.

    Parses assets/chinese_phonemes.txt (double-space separated, mirroring
    reference data_gen.py:33-41).
    """
    out: Dict[str, List[str]] = {}
    for line in _read_lines("chinese_phonemes.txt"):
        items = line.split("  ")
        if len(items) >= 2:
            out[items[0]] = items[1].split(" ")
    return out


@functools.lru_cache(None)
def lrw_word_arpabet() -> Dict[str, List[str]]:
    """Uppercased LRW word -> ARPABET pronunciation (precomputed g2p)."""
    with open(os.path.join(_ASSETS, "lrw_word_arpabet.json"), "r") as f:
        return json.load(f)


@functools.lru_cache(None)
def lrw_words() -> List[str]:
    return _read_lines("lrw_words.txt")


@functools.lru_cache(None)
def lrw1000_words() -> List[str]:
    return _read_lines("lrw1000_words.txt")


@functools.lru_cache(None)
def words_1500() -> List[str]:
    """The 1500-class word list for the classify pretraining workload
    (500 LRW words + 1000 LRW-1000 pinyin entries; reference list_vocabs.py)."""
    return _read_lines("words_1500.txt")


def word_to_phonemes(word: str) -> List[str]:
    """English word -> unified phoneme symbols (g2p + english map)."""
    table = lrw_word_arpabet()
    emap = english_phoneme_map()
    arpa = table[word.upper()]
    return [emap[a] for a in arpa]


def pinyin_to_phonemes(pinyins: Sequence[str]) -> List[str]:
    """Pinyin syllables -> unified phoneme symbols (concatenated)."""
    cmap = chinese_phoneme_map()
    out: List[str] = []
    for py in pinyins:
        out.extend(cmap[py])
    return out


def encode_english_word(word: str, vocab: Sequence[str] = TOTAL_PHONEMES) -> List[int]:
    """English word -> token ids under the given vocabulary
    (mirrors reference data_gen.py:143-146)."""
    return [vocab.index(ph) for ph in word_to_phonemes(word)]


def encode_pinyin_seq(pinyins: Sequence[str], vocab: Sequence[str] = TOTAL_PHONEMES) -> List[int]:
    """Pinyin syllable sequence -> token ids under the given vocabulary
    (mirrors reference data_gen.py:160-170)."""
    return [vocab.index(ph) for ph in pinyin_to_phonemes(pinyins)]


def decode_ids(ids: Sequence[int], vocab: Sequence[str] = TOTAL_PHONEMES,
               strip_special: bool = True) -> List[str]:
    """Token ids -> phoneme symbols; drops sos/eos/IGNORE_ID when asked
    (matching the eval-side filtering at reference train.py:252-257)."""
    out = []
    for i in ids:
        i = int(i)
        if strip_special and i in (SOS_ID, EOS_ID, IGNORE_ID):
            continue
        if 0 <= i < len(vocab):
            out.append(vocab[i])
    return out


def build_unified_vocab() -> List[str]:
    """Recompute the unified vocab from the data tables (the reference's
    generate_phonemes.py:1-56 pipeline): union of the 40 English phonemes
    (in english_phonemes.txt value order of first appearance) and the
    Mandarin phonemes, prefixed by sos/eos.

    This is the *generator*; TOTAL_PHONEMES is the canonical frozen result.
    """
    # The 40 English phonemes in the order fixed by the reference's
    # generator (generate_phonemes.py:50 `english_phonemes = [...]`).
    english = TOTAL_PHONEMES[2:42]
    total = ["sos", "eos"] + list(english)
    for line in _read_lines("chinese_phonemes.txt"):
        items = line.split("  ")
        if len(items) >= 2:
            for ph in items[1].split(" "):
                if ph not in total:
                    total.append(ph)
    return total
