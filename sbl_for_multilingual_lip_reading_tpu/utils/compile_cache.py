"""Persistent XLA compilation cache.

Full-dims SBL graphs take 1-5 minutes each to compile through the remote
TPU compile helper (the 8-segment decode alone ~6 min), and the reference
workflow re-runs the same graphs constantly (train restarts, eval sweeps,
bench).  JAX's persistent compilation cache stores the compiled executable
keyed by (HLO, compile options, jaxlib version); measured on this TPU via
the axon tunnel: 73.3 s cold -> 3.1 s warm for a toy graph, and full-dims
graphs skip their multi-minute compiles entirely on re-runs.

The cache only affects compile time, never the executable that runs, so
benchmarks and probes stay honest with it enabled.  Set
``SBL_COMPILE_CACHE=none`` (or ``--compile-cache none``) to disable.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "sbl_tpu_xla")
_OFF = ("", "none", "off", "0")


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path``.

    ``path=None`` resolves ``SBL_COMPILE_CACHE`` (default
    ``~/.cache/sbl_tpu_xla``); the strings {none, off, 0, ""} disable.
    Returns the directory in use, or None when disabled.  Safe to call
    before or after backend initialization (config flags, not env vars).
    """
    if path is None:
        path = os.environ.get("SBL_COMPILE_CACHE", DEFAULT_DIR)
    if path.strip().lower() in _OFF:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default threshold (1 s) already skips tiny graphs; make it explicit so
    # behavior doesn't drift with jax versions
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
