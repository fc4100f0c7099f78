"""Stem-conv lane-layout probe: can a batch-minor (CHWN) formulation kill
the lanes=W -> lanes=N relayout copy?

Round-2 traces show a 2.9 ms/iter whole-tensor copy between the Pallas
frame-stack kernel (ops/stem.py, emits (B*T, 5, 88, 88) in the default
row-major layout, lanes = W) and the stem conv (XLA's emitter wants the
batch dim in lanes for C_in=5).  If conv_general_dilated consumes a
("CHWN", "HWIO", "NHWC") lhs whose default layout already has N minor
without inserting the copy, the fix is to make the stack kernel write
N-minor directly (an in-kernel lane transpose).

Each variant pins its input to the default row-major layout with a trivial
Pallas passthrough -- reproducing the custom-call boundary the production
stem kernel creates -- and times conv-only and conv+bn/relu+pool contexts
with the robust loop protocol.

Usage: [BENCH_B=256] python tools/stem_layout_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import loop_t

KT, S, CO, K = 5, 88, 64, 7


def identity_pin(v, batch_axis):
    """Trivial Pallas passthrough: pins operand/result to the default
    row-major layout at this graph point (Mosaic custom calls only accept
    default layouts), standing in for the real stem-stack kernel."""
    from jax.experimental import pallas as pl
    n = v.shape[batch_axis]
    assert n % 64 == 0, (
        f"batch dim {n} not a multiple of the 64-row block: the tail block "
        f"would never be written and the timed conv would read garbage -- "
        f"pick BENCH_B so B*30 % 64 == 0")
    grid = (n // 64,)
    block = tuple(64 if a == batch_axis else d for a, d in enumerate(v.shape))

    def index(i):
        return tuple(i if a == batch_axis else 0 for a in range(v.ndim))

    return pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...]),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(block, index)],
        out_specs=pl.BlockSpec(block, index),
    )(v)


def epilogue(y):
    # BN(eval-fold)+relu+3x3/2 maxpool, the production consumers
    y = jnp.maximum(y.astype(jnp.float32) * 1.01 + 0.01, 0.0).astype(y.dtype)
    return jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def main():
    N = int(os.environ.get("BENCH_B", "256")) * 30
    rng_np = np.random.default_rng(0)
    w = jnp.asarray(rng_np.normal(0, 1 / np.sqrt(KT * K * K),
                                  (K, K, KT, CO)), jnp.bfloat16)
    x_nchw = jnp.asarray(rng_np.normal(0, 1, (N, KT, S, S)), jnp.bfloat16)
    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    x_chwn = jnp.transpose(x_nchw, (1, 2, 3, 0))
    gf = 2 * N * (S // 2) * (S // 2) * KT * K * K * CO / 1e9

    def conv(lhs_spec, batch_axis, pin=True, pool=False):
        @jax.jit
        def run(v):
            if pin:
                u = identity_pin(v, batch_axis)
            else:
                u = v
            out = jax.lax.conv_general_dilated(
                u, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=(lhs_spec, "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            if pool:
                out = epilogue(out)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return run

    variants = [
        ("NCHW pinned (production)", conv("NCHW", 0), x_nchw),
        ("NCHW pinned + pool      ", conv("NCHW", 0, pool=True), x_nchw),
        ("NHWC pinned             ", conv("NHWC", 0), x_nhwc),
        ("NHWC pinned + pool      ", conv("NHWC", 0, pool=True), x_nhwc),
        ("CHWN pinned             ", conv("CHWN", 3), x_chwn),
        ("CHWN pinned + pool      ", conv("CHWN", 3, pool=True), x_chwn),
        ("NCHW unpinned           ", conv("NCHW", 0, pin=False), x_nchw),
        ("CHWN unpinned           ", conv("CHWN", 3, pin=False), x_chwn),
    ]
    for name, fn, xin in variants:
        if os.environ.get("ONLY") and os.environ["ONLY"] not in name:
            continue
        try:
            t = loop_t(
                fn, xin, iters=4, inner=8, reps=3,
                perturb=lambda a, i: (a[0] + jnp.asarray(
                    0.001 * (i % 13 + 1), a[0].dtype),))
            print(f"{name}: {t:7.2f} ms ({gf / t:6.1f} GF/ms)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
