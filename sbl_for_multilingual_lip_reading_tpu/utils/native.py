"""ctypes bindings for the native host runtime (native/sbl_native.cc).

Gracefully degrades: every entry point has a pure-python fallback, so the
framework runs without the compiled library (build it with ``make -C
native``).  ``load_clip_batch`` feeds the device ingest path with a packed
uint8 batch straight from .npy files -- the native replacement for the
reference's DataLoader-worker decode (SBL data_gen.py:270-304).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsbl_native.so")

_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sbl_levenshtein.restype = ctypes.c_int32
        lib.sbl_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.sbl_load_clip_batch.restype = ctypes.c_int32
        lib.sbl_load_clip_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        _lib = lib
        return lib
    except OSError:
        return None


def build(verbose: bool = False) -> bool:
    """Compile the native library (requires g++/make)."""
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=not verbose)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib
    _lib = None
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def levenshtein_native(a: Sequence[int], b: Sequence[int]) -> Optional[int]:
    lib = _try_load()
    if lib is None:
        return None
    aa = np.asarray(a, dtype=np.int32)
    bb = np.asarray(b, dtype=np.int32)
    return int(lib.sbl_levenshtein(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb)))


def load_clip_batch(paths: List[str], frames: int, h: int, w: int,
                    nthreads: int = 4) -> np.ndarray:
    """Load .npy clips into a packed (N, frames, h, w) uint8 batch."""
    lib = _try_load()
    out = np.zeros((len(paths), frames, h, w), dtype=np.uint8)
    if lib is not None:
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode("utf-8") for p in paths])
        failures = lib.sbl_load_clip_batch(
            arr, len(paths),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            frames, h, w, nthreads)
        if failures == 0:
            return out
        # fall through and retry failed slots in python
    for i, p in enumerate(paths):
        try:
            a = np.load(p)
        except Exception:
            continue
        if a.dtype != np.uint8:
            a = ((a * 255.0) if a.max() <= 1.0 else a)
            a = np.clip(a, 0, 255).astype(np.uint8)
        t = min(len(a), frames)
        if a.shape[1:] == (h, w):
            out[i, :t] = a[:t]
    return out
