"""TPU bisect: cumulative variants of the fused decoder layer + an XLA
matmul calibration, all with chained (cache-defeating) timing."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, L, Tk, D, H, d, DI = 256, 17, 31, 512, 8, 64, 2048
Bt = 16
dtype = jnp.bfloat16
rng = np.random.default_rng(0)
_LN_EPS = 1e-6


def chain_t(fn, x, *rest, iters=30):
    """Chained + per-iter scalar fetch: chaining defeats any result cache,
    and fetching one element to host each iteration forces the tunnel to
    actually materialize the result (block_until_ready alone measured a
    4096^3 matmul at 4400 TF/s -- 22x over v5e peak -- so it does NOT
    synchronize real execution here)."""
    inner = 10
    x = fn(x, *rest)
    float(jnp.sum(x[0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        for _ in range(inner):
            x = fn(x, *rest)
        float(jnp.sum(x[0, 0]))
    dt = (time.perf_counter() - t0) / iters * 1000.0
    # subtract the fetch round-trip, measured on a no-op
    t1 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(x[0, 0]))
    rt = (time.perf_counter() - t1) / iters * 1000.0
    return (dt - rt) / inner


def arr(*shape, s=0.05):
    return jnp.asarray(rng.standard_normal(shape) * s, dtype)


# calibration: big XLA matmul, known cost 137 GFLOP
a = arr(4096, 4096, s=0.02)
w_cal = arr(4096, 4096, s=0.02)
mm = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32
                                  ).astype(dtype))
print(f"{'XLA matmul 4096^3 (137 GF)':34s} {chain_t(mm, a, w_cal):7.3f} ms",
      flush=True)

# calibration: chained megakernel itself
from sbl_for_multilingual_lip_reading_tpu.ops.decoder_layer import (
    fused_decoder_layer)

wq, wk, wv = arr(D, D), arr(D, D), arr(D, D)
fc_w, wq2, fc2_w = arr(D, D), arr(D, D), arr(D, D)
w1, w2 = arr(D, DI), arr(DI, D)
vecs = {k: jnp.asarray(rng.standard_normal(D) * 0.05, jnp.float32)
        for k in ["bq", "bk", "bv", "fc_b", "ln1_b", "bq2", "fc2_b",
                  "ln2_b", "b2", "ln3_b"]}
ones = {k: jnp.ones(D, jnp.float32) for k in ["ln1_s", "ln2_s", "ln3_s"]}
b1 = jnp.asarray(rng.standard_normal(DI) * 0.05, jnp.float32)
x0 = arr(B, L, D, s=1.0)
ckh = arr(B, Tk, H, d, s=1.0)
cvh = arr(B, Tk, H, d, s=1.0)
bias = jnp.where(jnp.triu(jnp.ones((L, L), bool), 1), -1e9, 0.0)


def mega(x, ckh, cvh):
    return fused_decoder_layer(
        x, wq, vecs["bq"], wk, vecs["bk"], wv, vecs["bv"],
        fc_w, vecs["fc_b"], ones["ln1_s"], vecs["ln1_b"],
        wq2, vecs["bq2"], fc2_w, vecs["fc2_b"], ones["ln2_s"], vecs["ln2_b"],
        w1, b1, w2, vecs["b2"], ones["ln3_s"], vecs["ln3_b"],
        ckh, cvh, mask_bias=bias)


print(f"{'megakernel chained':34s} "
      f"{chain_t(jax.jit(mega), x0, ckh, cvh):7.3f} ms", flush=True)

# XLA module-composed equivalent (unfused ops, what the round-1 path does
# per layer modulo the Pallas attention): rough reference
def xla_layer(x, ckh, cvh):
    def ln(z):
        mu = jnp.mean(z, -1, keepdims=True)
        var = jnp.mean(jnp.square(z), -1, keepdims=True) - jnp.square(mu)
        return (z - mu) * jax.lax.rsqrt(var + _LN_EPS)

    xf = x.astype(jnp.float32)
    q = jnp.dot(x, wq).reshape(B, L, H, d)
    k = jnp.dot(x, wk).reshape(B, L, H, d)
    v = jnp.dot(x, wv).reshape(B, L, H, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) + bias
    p = jax.nn.softmax(s, axis=-1).astype(dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32
                     ).astype(dtype).reshape(B, L, D)
    h1 = ln(jnp.dot(ctx, fc_w, preferred_element_type=jnp.float32) + xf)
    h1c = h1.astype(dtype)
    q2 = jnp.dot(h1c, wq2).reshape(B, L, H, d)
    s2 = jnp.einsum("bqhd,bkhd->bhqk", q2, ckh,
                    preferred_element_type=jnp.float32)
    p2 = jax.nn.softmax(s2, axis=-1).astype(dtype)
    c2 = jnp.einsum("bhqk,bkhd->bqhd", p2, cvh,
                    preferred_element_type=jnp.float32
                    ).astype(dtype).reshape(B, L, D)
    h2 = ln(jnp.dot(c2, fc2_w, preferred_element_type=jnp.float32) + h1)
    h2c = h2.astype(dtype)
    u = jax.nn.relu(jnp.dot(h2c, w1, preferred_element_type=jnp.float32))
    h3 = ln(jnp.dot(u.astype(dtype), w2,
                    preferred_element_type=jnp.float32) + h2)
    return h3.astype(dtype)


print(f"{'XLA layer (unfused)':34s} "
      f"{chain_t(jax.jit(xla_layer), x0, ckh, cvh):7.3f} ms", flush=True)
