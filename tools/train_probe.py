"""Honest training-step throughput (tools/tpu_timing methodology).

Round-1's "430 clips/s @B=240" came from the broken block_until_ready
harness.  Here the optimizer state chains through iterations (every
dispatch is value-distinct, defeating the tunnel's result cache) and one
scalar fetch at the end syncs the queue; the ready-buffer re-fetch RTT is
subtracted.  The clip batch is device-resident (as with
Trainer(cache_on_device=True)), so this measures the step itself, not the
tunnel's 66 MB/step host transfer.

Usage: [BENCH_B=240] [DROPOUT0=1] python tools/train_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer
    from sbl_for_multilingual_lip_reading_tpu.data import (
        SyntheticPatternDataset)

    B = int(os.environ.get("BENCH_B", "240"))
    cfg = C.sbl()
    cfg = dataclasses.replace(cfg, batch_size=B)
    if os.environ.get("DROPOUT0"):
        cfg = dataclasses.replace(
            cfg, dims=dataclasses.replace(cfg.dims, dropout=0.0),
            frontend=dataclasses.replace(cfg.frontend, dropout=0.0))
    ds = SyntheticPatternDataset(n_words=8, samples_per_word=(B // 8) + 1,
                                 frames=cfg.data.frames,
                                 raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds, cache_on_device=True)
    batch = next(tr._device_batches(0))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    state, metrics = tr.train_step(tr.state, batch, tr.rng)
    print("compiled; warm loss", float(metrics["loss"]), flush=True)

    iters = int(os.environ.get("ITERS", "12"))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = tr.train_step(state, batch, tr.rng)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    for _ in range(iters):
        _ = float(metrics["loss"])
    rtt = time.perf_counter() - t1
    per = (dt - rtt) / iters
    print(f"train step @B={B}: {per * 1000:.1f} ms/step "
          f"({B / per:.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
