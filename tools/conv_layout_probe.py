"""Stage-1 conv formulation probe at the XLA level (no Pallas).

The stem conv (NCHW dimension_numbers, C_in=5) measures ~44% MXU while
the stage-1 trunk convs (NHWC, C=64) measure ~24% @B=256.  This times a
single stage-1-shaped conv under different dimension_numbers / spatial
paddings / dtypes to see how much of that gap is emitter choice.

Usage: python tools/conv_layout_probe.py [--shape 7680,22,64]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import chain_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=str, default="7680,22,64")
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    N, S, C = (int(v) for v in args.shape.split(","))
    rng = jax.random.PRNGKey(0)
    x = (jax.random.normal(rng, (N, S, S, C)) * 0.3).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, C, C))
         * 0.05).astype(jnp.bfloat16)
    gf = 2 * N * S * S * 9 * C * C / 1e9

    def conv_fn(lhs_spec, pad_to=None, out_dtype=jnp.bfloat16):
        @jax.jit
        def run(x):
            v = x
            if pad_to is not None and pad_to > S:
                p = pad_to - S
                v = jnp.pad(v, ((0, 0), (0, p), (0, p), (0, 0)))
            if lhs_spec == "NCHW":
                v = jnp.transpose(v, (0, 3, 1, 2))
            out = jax.lax.conv_general_dilated(
                v, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=(lhs_spec, "HWIO", "NHWC"),
                preferred_element_type=out_dtype)
            if pad_to is not None and pad_to > S:
                out = out[:, :S, :S, :]
            # cast back so the output chains as the next input
            if lhs_spec == "NCHW":
                return out.astype(x.dtype)
            return out.astype(x.dtype)
        return run

    def bnrelu(v, i=0):
        return jnp.maximum(v.astype(jnp.float32) * 1.01 + 0.01 * i,
                           0.0).astype(jnp.bfloat16)

    def conv1(v):
        return jax.lax.conv_general_dilated(
            v, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @jax.jit
    def block_chain(x):
        # a stage-1-like context: 4 convs with BN/ReLU epilogues and a
        # residual -- does XLA still pick the fast standalone layout?
        h = bnrelu(conv1(x), 1)
        h = bnrelu(conv1(h) + x.astype(jnp.bfloat16), 2)
        y = bnrelu(conv1(h), 3)
        y = bnrelu(conv1(y) + h, 4)
        return y

    def identity_pin(v):
        # trivial Pallas passthrough: pins its operand/result to the
        # default row-major layout at this graph point
        from jax.experimental import pallas as pl
        return pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...]),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            grid=(v.shape[0] // 64,),
            in_specs=[pl.BlockSpec((64,) + v.shape[1:],
                                   lambda i: (i, 0, 0, 0))],
            out_specs=pl.BlockSpec((64,) + v.shape[1:],
                                   lambda i: (i, 0, 0, 0)),
        )(v)

    @jax.jit
    def block_chain_pinned(x):
        x = identity_pin(x)
        h = bnrelu(conv1(x), 1)
        h = identity_pin(h)
        h = bnrelu(conv1(h) + x.astype(jnp.bfloat16), 2)
        h = identity_pin(h)
        y = bnrelu(conv1(h), 3)
        y = identity_pin(y)
        y = bnrelu(conv1(y) + h, 4)
        return y

    # --- context variants: reproduce the FULL-graph producer (maxpool /
    # stem conv) ahead of the chain to see where the bad layout comes from
    xp = (jax.random.normal(jax.random.fold_in(rng, 2),
                            (N, 2 * S, 2 * S, C)) * 0.3).astype(jnp.bfloat16)

    def _pool(v):
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    @jax.jit
    def pool_chain(xp):
        y = block_chain(_pool(xp))
        # tile back up so the output chains as the next input (constant
        # ~2x-write overhead, identical across the pool variants)
        return jnp.tile(y, (1, 2, 2, 1))

    @jax.jit
    def pool_barrier_chain(xp):
        y = block_chain(jax.lax.optimization_barrier(_pool(xp)))
        return jnp.tile(y, (1, 2, 2, 1))

    variants = [
        ("NHWC (baseline)   ", conv_fn("NHWC"), x),
        ("NCHW dims         ", conv_fn("NCHW"), x),
        ("NHWC pad 22->24   ", conv_fn("NHWC", pad_to=24), x),
        ("NHWC pad 22->32   ", conv_fn("NHWC", pad_to=32), x),
        ("NHWC f32 accum out", conv_fn("NHWC", out_dtype=jnp.float32), x),
        ("4conv block chain ", block_chain, x),
        ("4conv chain pinned", block_chain_pinned, x),
        ("pool + chain      ", pool_chain, xp),
        ("pool + barrier + chain", pool_barrier_chain, xp),
    ]
    for name, fn, xin in variants:
        if args.only and args.only not in name:
            continue
        try:
            t = chain_t(fn, xin, iters=6, inner=8)
            print(f"{name}: {t:7.2f} ms ({gf / t:6.1f} GF/ms)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {str(e).splitlines()[0][:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
