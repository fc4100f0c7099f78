"""Stem probe, round 2, with trust-worthy timing (tools/tpu_timing.loop_t).

Round-1 stem numbers (stack 10ms / conv 6.7ms / pool 5.8ms vs ~25ms fused,
CLAUDE.md) came from a harness that neither synced execution nor defeated
the tunnel's value-identical dispatch cache -- re-measure everything before
building a Pallas stem.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import loop_t

B, T, S, C, kt = 256, 30, 88, 64, 5
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.standard_normal((B, T, S, S)), dtype)
k3 = jnp.asarray(rng.standard_normal((7, 7, kt, C)) * 0.05, dtype)
bn_scale = jnp.asarray(rng.standard_normal(C), jnp.float32)
bn_bias = jnp.asarray(rng.standard_normal(C), jnp.float32)
bar = jax.lax.optimization_barrier


def perturb(args, i):
    return (args[0] + jnp.asarray(0.001 * (i + 1), dtype),) + args[1:]


def pad_t(x):
    return jnp.pad(x, ((0, 0), (kt // 2, kt // 2), (0, 0), (0, 0)))


def conv(xs, dn):
    return jax.lax.conv_general_dilated(
        xs, k3, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=dn, preferred_element_type=dtype)


def bn_relu(y):
    z = y.astype(jnp.float32) * bn_scale + bn_bias
    return jnp.maximum(z, 0.0).astype(dtype)


def pool_rw(z):
    return jax.lax.reduce_window(
        z, jnp.finfo(z.dtype).min, jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def stack_minor(x):
    xp = pad_t(x)
    xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=-1)
    return xs.reshape(B * T, S, S, kt)


def stack_nchw(x):
    xp = pad_t(x)
    xs = jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=2)
    return xs.reshape(B * T, kt, S, S)


def run(name, fn, *args):
    f = jax.jit(fn)
    try:
        dt = loop_t(f, *args, iters=10, perturb=perturb)
        print(f"{name:44s} {dt:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e).splitlines()[0][:80]}", flush=True)


variants = {
    "stem r1 (bar(stack_minor)+conv+bn+pool)":
        lambda x: pool_rw(bn_relu(conv(bar(stack_minor(x)),
                                       ("NHWC", "HWIO", "NHWC")))),
    "stem fused (stack_minor+conv+bn+pool)":
        lambda x: pool_rw(bn_relu(conv(stack_minor(x),
                                       ("NHWC", "HWIO", "NHWC")))),
    "stem nchw (stack_nchw+conv+bn+pool)":
        lambda x: pool_rw(bn_relu(conv(stack_nchw(x),
                                       ("NCHW", "HWIO", "NHWC")))),
}
for name, fn in variants.items():
    run(name, fn, x0)

# isolated parts
run("stack_minor only", stack_minor, x0)
xs_m = jax.block_until_ready(jax.jit(stack_minor)(x0))
run("conv only (minor NHWC)",
    lambda xs: conv(xs, ("NHWC", "HWIO", "NHWC")), xs_m)
y0 = jax.block_until_ready(
    jax.jit(lambda xs: conv(xs, ("NHWC", "HWIO", "NHWC")))(xs_m))
run("bn+relu+pool only", lambda z: pool_rw(bn_relu(z)), y0)
