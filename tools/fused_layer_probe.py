"""TPU bisect probe for the fused decoder-layer megakernel: standalone call,
then direction-vmapped, at real decode shapes."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.ops.decoder_layer import (
    fused_decoder_layer)

B, L, Tk, D, H, d, DI = 256, 17, 31, 512, 8, 64, 2048
dtype = jnp.bfloat16
rng = np.random.default_rng(0)


def arr(*shape, s=0.05):
    return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)


def weights(prefix=""):
    return dict(
        wq=arr(D, H * d), bq=arr(H * d), wk=arr(D, H * d), bk=arr(H * d),
        wv=arr(D, H * d), bv=arr(H * d), fc_w=arr(H * d, D), fc_b=arr(D),
        ln1_s=arr(D) + 1, ln1_b=arr(D),
        wq2=arr(D, H * d), bq2=arr(H * d), fc2_w=arr(H * d, D), fc2_b=arr(D),
        ln2_s=arr(D) + 1, ln2_b=arr(D),
        w1=arr(D, DI), b1=arr(DI), w2=arr(DI, D), b2=arr(D),
        ln3_s=arr(D) + 1, ln3_b=arr(D),
    )


def main():
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype)
    ckh = jnp.asarray(rng.standard_normal((B, Tk, H, d)), dtype)
    cvh = jnp.asarray(rng.standard_normal((B, Tk, H, d)), dtype)
    bias = jnp.where(jnp.triu(jnp.ones((L, L), bool), 1), -1e9, 0.0)
    w = weights()

    def call(x, ckh, cvh, w):
        return fused_decoder_layer(
            x, w["wq"], w["bq"], w["wk"], w["bk"], w["wv"], w["bv"],
            w["fc_w"], w["fc_b"], w["ln1_s"], w["ln1_b"],
            w["wq2"], w["bq2"], w["fc2_w"], w["fc2_b"], w["ln2_s"], w["ln2_b"],
            w["w1"], w["b1"], w["w2"], w["b2"], w["ln3_s"], w["ln3_b"],
            ckh, cvh, mask_bias=bias)

    for name, fn, args in [
        ("standalone", jax.jit(call), (x, ckh, cvh, w)),
        ("vmap(dir=2)", jax.jit(jax.vmap(call)),
         (jnp.stack([x, x]), jnp.stack([ckh, ckh]), jnp.stack([cvh, cvh]),
          jax.tree.map(lambda a: jnp.stack([a, a]), w))),
    ]:
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            print(f"OK   {name}: compile+run {time.perf_counter()-t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(*args)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 20 * 1000
            print(f"     {name}: {dt:.3f} ms/call", flush=True)
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:150]}", flush=True)
            for ln in str(e).splitlines():
                if "tpu." in ln or "vector<" in ln:
                    print("     " + ln.strip()[:160], flush=True)


if __name__ == "__main__":
    main()
