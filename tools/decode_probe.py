"""TPU probe: SBL decode-only throughput, round-1 path vs decoder-layer
megakernel (ops/decoder_layer.py).  Full reference dims, B=256.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.models.decoder_sbl import SBLDecoder

B, Tk, D = int(os.environ.get("PROBE_B", "256")), 31, 512
dtype = jnp.bfloat16


def bench(name, dec, variables, enc, iters=20):
    fn = jax.jit(lambda v, e: dec.apply(v, e, method=SBLDecoder.recognize))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(variables, enc))
    print(f"{name:28s} compile+run {time.perf_counter()-t0:6.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, enc)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{name:28s} {dt:7.2f} ms  ({B/dt*1000:8.1f} clips/s)", flush=True)
    return out


def main():
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, Tk, D)), dtype)
    base = dict(vocab_size=58, d_model=D, n_layers=6, n_head=8, d_k=64,
                d_v=64, d_inner=2048, dropout=0.1, maxlen=16,
                decode_segments=4, dtype=dtype, use_pallas=True)
    dec0 = SBLDecoder(**base)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda: dec0.init({"params": rng}, enc[:2], method=SBLDecoder.recognize))()
    y0 = bench("round1 (fused_small_mha)", dec0, variables, enc)
    dec1 = SBLDecoder(**base, use_fused_layer=True)
    y1 = bench("megakernel", dec1, variables, enc)
    agree = float(jnp.mean((y0[0] == y1[0]).astype(jnp.float32)))
    print(f"l2r token agreement: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
