"""Robust TPU timing for the axon tunnel.

Two failure modes of naive timing here (measured, tools/megakernel_bisect.py):
* ``block_until_ready`` does not synchronize real device execution through
  the tunnel -- a 137-GFLOP matmul "measured" 0.031 ms (4400 TF/s, 22x over
  v5e peak).
* repeated dispatch of value-identical (executable, args) pairs can return
  cached-fast results, so un-chained loops over the same input under-measure.

``chain_t`` defeats both: each iteration feeds the previous output back as
the first argument (values must keep evolving -- avoid fixed points like
all-zero decay), and a scalar is fetched to host every ``inner`` calls to
force materialization, with the fetch round-trip subtracted.
"""
from __future__ import annotations

import time

import jax.numpy as jnp


def chain_t(fn, x, *rest, iters=10, inner=10):
    """ms per fn call; fn's output must have the shape/dtype of ``x``."""
    x = fn(x, *rest)
    float(jnp.sum(x.reshape(-1)[:8]))
    t0 = time.perf_counter()
    for _ in range(iters):
        for _ in range(inner):
            x = fn(x, *rest)
        float(jnp.sum(x.reshape(-1)[:8]))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    t1 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(x.reshape(-1)[:8]))
    rt = (time.perf_counter() - t1) / iters * 1000.0
    return (dt - rt) / inner


def loop_t(fn, *args, iters=20, perturb=None, inner=1, reps=1):
    """ms per fn call for non-chainable fns.  ``perturb(args, i) -> args``
    must change at least one input value each iteration (or results may be
    served from a cache); the result is fetched once per ``inner`` calls.

    The fetch that forces materialization costs a full queue-flush round
    trip through the axon tunnel (~45-60 ms, measured via a B=64 encoder
    whose compute is <1 ms) and the ready-buffer re-fetch baseline
    subtracted below does NOT include it, so with inner=1 that sync cost
    pollutes the result.  Distinct-input dispatches enqueue asynchronously
    and execute serially, so ``inner`` > 1 amortizes the sync: time/call =
    compute + sync/inner.

    ``reps`` repeats the whole measurement block and combines as
    min(dt) - min(rt): tunnel-congestion stalls of multiple seconds land
    inside individual blocks and bias a single-block reading in EITHER
    direction (a stall in the compute block overstates; a stall in the
    baseline block over-subtracts and understates -- both observed
    2026-08-17, bench.py history).  min/min is conservative on both ends.
    Baseline fetches are salted so each is a value-distinct dispatch (the
    tunnel serves value-identical dispatches cached-fast)."""
    out = fn(*args)
    _touch(out)
    dts, rts = [], []
    n = 0
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            for j in range(inner):
                a = perturb(args, n) if perturb is not None else args
                n += 1
                out = fn(*a)
            _touch(out, salt=r + 1)
        dts.append(time.perf_counter() - t0)
        t1 = time.perf_counter()
        for k in range(iters):
            _touch(out, salt=k + 1)
        rts.append(time.perf_counter() - t1)
    dt = min(dts) / (iters * inner) * 1000.0
    rt = min(rts) / (iters * inner) * 1000.0
    return dt - rt


def _touch(out, salt=0):
    import jax
    leaf = jax.tree.leaves(out)[0]
    # ``+ salt`` makes the fetch a value-distinct dispatch per salt while
    # still reading the buffer (an offset SLICE can be empty for scalar
    # outputs and then never touches the data)
    float((jnp.sum(leaf.reshape(-1)[:8]) + salt).astype(jnp.float32))
