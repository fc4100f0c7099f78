"""Probe the frontend stem's XLA fusion/layout anomaly on TPU.

Round-1 finding (CLAUDE.md): isolated stem parts measure ~7ms total
(stack 0.2 + conv ~1 + bn/pool 5.4) at B=256, but the fused composition
runs ~25ms -- XLA picks bad layouts across the stack->conv->pool boundary.
This script times the composition under different optimization_barrier
placements to find the cheapest fix before resorting to a Pallas stem.

Usage: python tools/stem_probe.py [--batch 256]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    B, T, S, C = args.batch, 30, 88, 64
    kt = 5
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, S, S)), dtype)
    k2d = jnp.asarray(rng.standard_normal((7, 7, kt, C)) * 0.05, dtype)
    bn_scale = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bn_bias = jnp.asarray(rng.standard_normal(C), jnp.float32)

    def stack(x):
        xp = jnp.pad(x, ((0, 0), (kt // 2, kt // 2), (0, 0), (0, 0)))
        xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=-1)
        return xs.reshape(B * T, S, S, kt)

    def conv(xs):
        return jax.lax.conv_general_dilated(
            xs, k2d, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dtype)

    def bn_relu(y):
        z = y.astype(jnp.float32) * bn_scale + bn_bias
        return jnp.maximum(z, 0.0).astype(dtype)

    def pool(z):
        return jax.lax.reduce_window(
            z, -jnp.inf if z.dtype == jnp.float32 else jnp.finfo(z.dtype).min,
            jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    bar = jax.lax.optimization_barrier

    variants = {
        "A_current(bar_after_stack)": lambda x: pool(bn_relu(conv(bar(stack(x))))),
        "B_bar_stack+conv": lambda x: pool(bn_relu(bar(conv(bar(stack(x)))))),
        "C_bar_stack+bn": lambda x: pool(bar(bn_relu(conv(bar(stack(x)))))),
        "D_bar_everywhere": lambda x: pool(bar(bn_relu(bar(conv(bar(stack(x))))))),
        "E_nobar": lambda x: pool(bn_relu(conv(stack(x)))),
    }
    for name, fn in variants.items():
        ms = timeit(jax.jit(fn), x)
        print(f"{name:32s} {ms:7.2f} ms", flush=True)

    # isolated pieces (round-1 reproduction)
    xs = jax.block_until_ready(jax.jit(stack)(x))
    y = jax.block_until_ready(jax.jit(conv)(xs))
    print(f"{'stack_only':32s} {timeit(jax.jit(stack), x):7.2f} ms")
    print(f"{'conv_only':32s} {timeit(jax.jit(conv), xs):7.2f} ms")
    print(f"{'bnpool_only':32s} "
          f"{timeit(jax.jit(lambda y: pool(bn_relu(y))), y):7.2f} ms")


if __name__ == "__main__":
    main()
