"""On-chip numerics + timing for the fused BasicBlock kernel.

For each eligible stage shape (N=7680): correctness vs the XLA conv
composition at full dims, then chained-dispatch timing of both paths
(tools/tpu_timing.py::chain_t -- output feeds back as input, so values
keep evolving and the tunnel cannot serve cached results).

Usage: python tools/resblock_probe.py [--stages 22,11,6,3]
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
    ap.add_argument("--batch", type=int, default=7680)
    ap.add_argument("--stages", type=str, default="22:64,11:128,6:256,3:512")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    from sbl_for_multilingual_lip_reading_tpu.ops.resblock import (
        fused_resblock)

    N = args.batch
    for spec in args.stages.split(","):
        S, C = (int(v) for v in spec.split(":"))
        rng = jax.random.PRNGKey(S)
        ks = jax.random.split(rng, 7)
        x = (jax.random.normal(ks[0], (N, S, S, C)) * 0.5).astype(jnp.bfloat16)
        w1 = (jax.random.normal(ks[1], (3, 3, C, C))
              * float(np.sqrt(2.0 / (9 * C)))).astype(jnp.bfloat16)
        w2 = (jax.random.normal(ks[2], (3, 3, C, C))
              * float(np.sqrt(2.0 / (9 * C)))).astype(jnp.bfloat16)
        a1 = jax.random.uniform(ks[3], (C,), minval=0.8, maxval=1.2)
        b1 = jax.random.normal(ks[4], (C,)) * 0.05
        a2 = jax.random.uniform(ks[5], (C,), minval=0.8, maxval=1.2)
        b2 = jax.random.normal(ks[6], (C,)) * 0.05

        @jax.jit
        def xla_block(x):
            def conv(v, w):
                return jax.lax.conv_general_dilated(
                    v, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
            h = jnp.maximum(conv(x, w1).astype(jnp.float32) * a1 + b1, 0.0)
            y = conv(h.astype(jnp.bfloat16), w2).astype(jnp.float32) \
                * a2 + b2 + x.astype(jnp.float32)
            return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

        @jax.jit
        def fused_block(x):
            return fused_resblock(x, w1, a1, b1, w2, a2, b2)

        ref = np.asarray(xla_block(x)[:64]).astype(np.float32)
        got = np.asarray(fused_block(x)[:64]).astype(np.float32)
        err = np.abs(ref - got).max()
        rel = err / max(np.abs(ref).max(), 1e-6)
        gf = 2 * 2 * N * S * S * 9 * C * C / 1e9
        t_xla = chain_t(xla_block, x, iters=args.iters, inner=args.inner)
        t_fused = chain_t(fused_block, x, iters=args.iters, inner=args.inner)
        print(f"S={S:3d} C={C:4d}: |err|={err:.4f} (rel {rel:.4f})  "
              f"xla {t_xla:7.2f} ms ({gf / t_xla:6.1f} GF/ms)  "
              f"fused {t_fused:7.2f} ms ({gf / t_fused:6.1f} GF/ms)  "
              f"speedup {t_xla / t_fused:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
