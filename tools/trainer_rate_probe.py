"""In-situ Trainer throughput: blocking vs one-step-lagged loss fetch.

The production train_epoch used to block on ``float(metrics['loss'])``
every step, paying the axon tunnel's ~45-60 ms fetch round trip on the
critical path (~12% of the 427 ms full-dims step).  The lagged loop
(trainer.py::train_epoch consume()) fetches the PREVIOUS step's loss while
the current step executes, so the RTT overlaps device compute.

Both modes below run the SAME donated, jit-compiled train step on
device-cached synthetic data at the reference batch (B=240, dropout
active, distinct batches per step via the epoch gather + rng fold), and
every iteration fetches a real loss value, so wall-clock epoch timing is
honest by the repo's tunnel rules (tools/tpu_timing.py).

Usage: [STEPS=12] [BENCH_B=240] python tools/trainer_rate_probe.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer
    from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache import (
        enable_compile_cache)

    enable_compile_cache()

    B = int(os.environ.get("BENCH_B", "240"))
    steps = int(os.environ.get("STEPS", "12"))
    cfg = C.sbl()
    if B != cfg.batch_size:
        cfg = dataclasses.replace(cfg, batch_size=B)
    # exactly `steps` batches per epoch (the device-batch generator stops
    # at the dataset's end; a too-small set silently shortens the epoch)
    ds = SyntheticLipDataset(size=steps * B, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size, pad_len=14,
                             kind="all", vocab="sbl")
    tr = Trainer(cfg, ds, cache_on_device=True)

    # compile + warm both graphs (step; the epoch loop reuses it)
    tr.train_epoch(0, max_steps=2)

    def epoch_rate(epoch):
        t0 = time.perf_counter()
        tr.train_epoch(epoch, max_steps=steps)
        return (time.perf_counter() - t0) / steps * 1000.0

    def blocking_rate(epoch):
        it = tr._device_batches(epoch)
        t0 = time.perf_counter()
        n = 0
        for i, batch in enumerate(it):
            if i >= steps:
                break
            tr.state, m = tr.train_step(tr.state, batch, tr.rng)
            float(m["loss"])          # the old per-step blocking fetch
            n += 1
        assert n == steps, f"epoch yielded {n} batches, wanted {steps}"
        return (time.perf_counter() - t0) / steps * 1000.0

    def bare_rate(epoch, step_fn):
        """Chained step over the device-batch generator (no prefetch
        thread), fetching only the final loss -- isolates the step itself
        from the epoch-loop machinery.  Batches stream one at a time so
        HBM holds a single gathered batch (pre-materializing 12 of them
        OOMed the non-donating executable: +0.8 GB batches +0.56 GB
        double-buffered state on top of the ~15 GB B=240 working set)."""
        s = tr.state
        it = tr._device_batches(epoch)
        s, m = step_fn(s, next(it), tr.rng)     # warm (compile/donation)
        float(m["loss"])
        t0 = time.perf_counter()
        n = 0
        for i, b in enumerate(it):
            if i >= steps:
                break
            s, m = step_fn(s, b, tr.rng)
            n += 1
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n * 1000.0
        it.close()                 # drop any generator-held device batch
        tr.state = s
        return dt

    def chain_1batch(epoch):
        """One pre-built device batch reused for every step: the pure
        train-step dispatch rate with zero per-step generator / transfer
        work (state chains, so dispatches are never value-identical).
        (bare - chain1b) attributes the generator+transfer dispatch cost;
        (lagged - bare) the per-step fetch cost."""
        it = tr._device_batches(epoch)
        batch = next(it)
        it.close()                 # free the generator's prefetch slot
        s = tr.state
        s, m = tr.train_step(s, batch, tr.rng)   # warm (donation shape)
        t0 = time.perf_counter()
        for _ in range(steps):
            s, m = tr.train_step(s, batch, tr.rng)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / steps * 1000.0
        tr.state = s
        return dt

    # The non-donating step doubles the live param/opt set; build and warm
    # it LAZILY (first use) so its extra state never sits in HBM during the
    # donated jobs -- keeping it alive in a local across chain-1b OOMed the
    # B=240 working set on a real run.
    _nodon = []

    def step_nodon(s, b, rng):
        if not _nodon:
            from sbl_for_multilingual_lip_reading_tpu.training.steps import (
                make_sbl_train_step)
            _nodon.append(make_sbl_train_step(tr.model, tr.tx, cfg,
                                              donate=False))
        return _nodon[0](s, b, rng)

    def epoch_rate_generator(epoch):
        # the pre-fused cached path: per-step jnp.asarray + jnp.take RPCs
        os.environ["SBL_NO_EPOCH_FUSED"] = "1"
        try:
            return epoch_rate(epoch)
        finally:
            del os.environ["SBL_NO_EPOCH_FUSED"]

    # "fused" = train_epoch default (epoch-fused cached step: order+plans
    # uploaded once, gather inside the jitted step); "lagged-gen" = the
    # old generator path (two extra tunnel RPCs per step); "chain-1b" =
    # dispatch-rate floor; "bare-don" = generator work inline, no epoch
    # machinery.  nodon jobs dropped from the default list -- donation's
    # win is recorded (CLAUDE.md round 3) and their extra state risks the
    # B=240 HBM edge.
    jobs = [("fused     ", lambda e: epoch_rate(e), 0),
            ("chain-1b  ", lambda e: chain_1batch(e), 1),
            ("fused2    ", lambda e: epoch_rate(e), 7),
            ("lagged-gen", lambda e: epoch_rate_generator(e), 5),
            ("bare-don  ", lambda e: bare_rate(e, tr.train_step), 3),
            ("blocking  ", lambda e: blocking_rate(e), 6)]
    if os.environ.get("NODON"):
        jobs += [("bare-nodon", lambda e: bare_rate(e, step_nodon), 2),
                 ("bare-nodo2", lambda e: bare_rate(e, step_nodon), 4)]
    for name, fn, e in jobs:
        ms = fn(e)
        print(f"{name}: {ms:7.2f} ms/step ({B / ms * 1000:7.1f} clips/s)",
              flush=True)


if __name__ == "__main__":
    main()
