"""Stem probe round 2: layout experiments for the conv3d-as-2d stem.

The round-2 probe (stem_probe.py) showed the composition is no longer
anomalous -- the PARTS are slow: stack 10ms (the (B*T,88,88,5) layout pads
the 5-wide minor dim to 128 lanes => ~25x write amplification), conv 6.7ms,
bn+relu+maxpool 5.8ms.  This probe tries tap-channel placements that avoid
the minor-dim-5 tensor, pool decompositions, and fused compositions.
"""
from __future__ import annotations

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


B, T, S, C, kt = 256, 30, 88, 64, 5
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, T, S, S)), dtype)
k3 = jnp.asarray(rng.standard_normal((7, 7, kt, C)) * 0.05, dtype)
bn_scale = jnp.asarray(rng.standard_normal(C), jnp.float32)
bn_bias = jnp.asarray(rng.standard_normal(C), jnp.float32)
bar = jax.lax.optimization_barrier


def pad_t(x):
    return jnp.pad(x, ((0, 0), (kt // 2, kt // 2), (0, 0), (0, 0)))


def conv(xs, dn, k=None):
    return jax.lax.conv_general_dilated(
        xs, k3 if k is None else k, window_strides=(2, 2),
        padding=((3, 3), (3, 3)), dimension_numbers=dn,
        preferred_element_type=dtype)


def bn_relu(y):
    z = y.astype(jnp.float32) * bn_scale + bn_bias
    return jnp.maximum(z, 0.0).astype(dtype)


def pool_rw(z):
    return jax.lax.reduce_window(
        z, jnp.finfo(z.dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def pool_slices(z):
    """3x3 s2 maxpool as max of 9 strided slices (pad1): z (N,44,44,C)."""
    N, Hh, Ww, Cc = z.shape
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=jnp.finfo(z.dtype).min)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = jax.lax.slice(zp, (0, dy, dx, 0),
                              (N, dy + Hh - 1, dx + Ww - 1, Cc), (1, 2, 2, 1))
            out = s if out is None else jnp.maximum(out, s)
    return out


def pool_sep(z):
    """separable: 1x3 then 3x1 max."""
    z = jax.lax.reduce_window(z, jnp.finfo(z.dtype).min, jax.lax.max,
                              (1, 1, 3, 1), (1, 1, 2, 1),
                              ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jax.lax.reduce_window(z, jnp.finfo(z.dtype).min, jax.lax.max,
                                 (1, 3, 1, 1), (1, 2, 1, 1),
                                 ((0, 0), (1, 1), (0, 0), (0, 0)))


# --- stack variants ---------------------------------------------------------
def stack_minor(x):   # (B*T, S, S, kt) — current
    xp = pad_t(x)
    xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=-1)
    return xs.reshape(B * T, S, S, kt)


def stack_nchw(x):    # (B*T, kt, S, S)
    xp = pad_t(x)
    xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=2)
    return xs.reshape(B * T, kt, S, S)


def stack_nhcw(x):    # (B*T, S, kt, S)
    xp = pad_t(x)
    xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=3)
    return xs.reshape(B * T, S, kt, S)


variants = {
    "cur: bar(stack_minor)+conv+bn+rw": lambda x: pool_rw(bn_relu(conv(bar(stack_minor(x)), ("NHWC", "HWIO", "NHWC")))),
    "nchw: bar(stack)+conv+bn+rw": lambda x: pool_rw(bn_relu(conv(bar(stack_nchw(x)), ("NCHW", "HWIO", "NHWC")))),
    "nhcw: bar(stack)+conv+bn+rw": lambda x: pool_rw(bn_relu(conv(bar(stack_nhcw(x)), ("NHCW", "HWIO", "NHWC")))),
    "nchw fused (no bar)": lambda x: pool_rw(bn_relu(conv(stack_nchw(x), ("NCHW", "HWIO", "NHWC")))),
    "cur + pool_slices": lambda x: pool_slices(bn_relu(conv(bar(stack_minor(x)), ("NHWC", "HWIO", "NHWC")))),
    "cur + pool_sep": lambda x: pool_sep(bn_relu(conv(bar(stack_minor(x)), ("NHWC", "HWIO", "NHWC")))),
    "nchw + pool_slices (no bar)": lambda x: pool_slices(bn_relu(conv(stack_nchw(x), ("NCHW", "HWIO", "NHWC")))),
}
for name, fn in variants.items():
    print(f"{name:42s} {timeit(jax.jit(fn), x):7.2f} ms", flush=True)

# isolated stacks
for name, fn in [("stack_minor", stack_minor), ("stack_nchw", stack_nchw),
                 ("stack_nhcw", stack_nhcw)]:
    print(f"{name:42s} {timeit(jax.jit(fn), x):7.2f} ms", flush=True)

# isolated convs per layout
xs_m = jax.block_until_ready(jax.jit(stack_minor)(x))
xs_c = jax.block_until_ready(jax.jit(stack_nchw)(x))
print(f"{'conv(minor NHWC)':42s} {timeit(jax.jit(lambda a: conv(a, ('NHWC', 'HWIO', 'NHWC'))), xs_m):7.2f} ms")
print(f"{'conv(NCHW)':42s} {timeit(jax.jit(lambda a: conv(a, ('NCHW', 'HWIO', 'NHWC'))), xs_c):7.2f} ms")
y = jax.block_until_ready(jax.jit(lambda a: conv(a, ("NHWC", "HWIO", "NHWC")))(xs_m))
print(f"{'bn+pool_rw':42s} {timeit(jax.jit(lambda z: pool_rw(bn_relu(z))), y):7.2f} ms")
print(f"{'bn+pool_slices':42s} {timeit(jax.jit(lambda z: pool_slices(bn_relu(z))), y):7.2f} ms")
print(f"{'bn+pool_sep':42s} {timeit(jax.jit(lambda z: pool_sep(bn_relu(z))), y):7.2f} ms")
