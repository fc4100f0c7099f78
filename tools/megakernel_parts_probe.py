"""TPU probe: where does the fused decoder-layer kernel's time go?

Times Pallas mini-kernels at the real decode shapes (Bt=16, L=17, D=512):
the 8 GEMMs alone, the batched-tiny-dot attention alone, and a
block-diagonal full-rows attention alternative (one big matmul per head,
cross-sample pairs masked).
"""
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


def t(fn, *args, iters=50):
    """Chained timing: the first arg of iteration i+1 is iteration i's
    output, defeating the axon tunnel's identical-dispatch result cache
    (same (executable, args) twice returns instantly -- measured 0.02 ms
    for a 32-GFLOP kernel, i.e. above hardware peak)."""
    x = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args[1:])
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_kernel(name, kernel, arg_shapes, out_shape, grid, in_specs,
                 out_specs):
    args = [jnp.asarray(rng.standard_normal(s) * 0.05, dtype)
            for s in arg_shapes]
    fn = jax.jit(pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        grid=grid, in_specs=in_specs, out_specs=out_specs))
    try:
        dt = t(fn, *args)
        print(f"{name:34s} {dt:7.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:34s} FAIL {str(e).splitlines()[0][:90]}", flush=True)


const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
xspec = pl.BlockSpec((Bt, L, D), lambda i: (i, 0, 0))


# ---- GEMMs only: 6x (272,512)@(512,512) + (272,512)@(512,2048)@(2048,512)
def gemms_kernel(x_ref, w_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[...].reshape(Bt * L, D)
    y = x
    for _ in range(6):
        y = jnp.dot(y, w_ref[...],
                    preferred_element_type=jnp.float32).astype(dtype)
    u = jnp.dot(y, w1_ref[...],
                preferred_element_type=jnp.float32).astype(dtype)
    y = jnp.dot(u, w2_ref[...],
                preferred_element_type=jnp.float32).astype(dtype)
    o_ref[...] = y.reshape(Bt, L, D)


bench_kernel("gemms only (6xDxD + FFN)", gemms_kernel,
             [(B, L, D), (D, D), (D, DI), (DI, D)], (B, L, D),
             (B // Bt,), [xspec, const(D, D), const(D, DI), const(DI, D)],
             xspec)


# ---- attention, batched tiny dots (current megakernel formulation)
def heads(x3):
    return jnp.concatenate(
        [x3[:, :, h * d:(h + 1) * d] for h in range(H)], axis=0)


def unheads(x):
    x4 = x.reshape(H, Bt, L, d)
    return jnp.concatenate([x4[h] for h in range(H)], axis=-1)


def attn_batched_kernel(q_ref, k_ref, v_ref, o_ref):
    q, k, v = heads(q_ref[...]), heads(k_ref[...]), heads(v_ref[...])
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = unheads(o).astype(dtype)


bench_kernel("attn batched tiny dots", attn_batched_kernel,
             [(B, L, D)] * 3, (B, L, D), (B // Bt,), [xspec] * 3, xspec)


# ---- attention, block-diagonal full-rows (one big matmul per head)
def attn_blockdiag_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    R = Bt * L
    q3, k3, v3 = q_ref[...], k_ref[...], v_ref[...]
    q2 = q3.reshape(R, D)
    k2 = k3.reshape(R, D)
    v2 = v3.reshape(R, D)
    mask = mask_ref[...].astype(jnp.float32)          # (R, R) 0/-1e9
    outs = []
    for h in range(H):
        qh = q2[:, h * d:(h + 1) * d]
        kh = k2[:, h * d:(h + 1) * d]
        vh = v2[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dtype)
        outs.append(jnp.dot(p, vh, preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, axis=-1).reshape(Bt, L, D).astype(dtype)


def blockdiag_mask():
    i = np.arange(Bt * L)
    same = (i[:, None] // L) == (i[None, :] // L)
    return np.where(same, 0.0, -1e9).astype(np.float32)


mask = jnp.asarray(blockdiag_mask(), dtype)
args = [jnp.asarray(rng.standard_normal((B, L, D)) * 0.05, dtype)
        for _ in range(3)]
fn = jax.jit(pl.pallas_call(
    attn_blockdiag_kernel,
    out_shape=jax.ShapeDtypeStruct((B, L, D), dtype),
    grid=(B // Bt,),
    in_specs=[xspec] * 3 + [const(Bt * L, Bt * L)],
    out_specs=xspec))
try:
    dt = t(fn, *args, mask)
    print(f"{'attn block-diag full rows':34s} {dt:7.3f} ms", flush=True)
except Exception as e:
    print(f"{'attn block-diag full rows':34s} FAIL "
          f"{str(e).splitlines()[0][:90]}", flush=True)
