"""A/B the flat attention kernel's batch-tile size at decode shapes.

Per-call cost at L=17 is dominated by 4096 tiny batched dots; bigger tiles
mean fewer grid programs (less per-program overhead) but more VMEM.
Honest timing via tools/tpu_timing.loop_t with amortized fetches.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import loop_t
from sbl_for_multilingual_lip_reading_tpu.ops.attention import (
    fused_small_mha_flat)


def main():
    B = int(os.environ.get("BENCH_B", "256"))
    rng = np.random.default_rng(0)
    for (Tq, Tk, label) in [(17, 17, "self L=17"), (17, 30, "cross L=17"),
                            (9, 30, "cross L=9")]:
        q = jnp.asarray(rng.standard_normal((2, B, Tq, 512)) * 0.3,
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((2, B, Tk, 512)) * 0.3,
                        jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((2, B, Tk, 512)) * 0.3,
                        jnp.bfloat16)

        def pert(args, i):
            return (args[0] + jnp.asarray(0.01 * (i + 1), args[0].dtype),
                    args[1], args[2])

        for cap in (8, 16, 32):
            # direction-vmapped like the decoder uses it
            f = jax.jit(jax.vmap(
                lambda a, b, c, _cap=cap: fused_small_mha_flat(
                    a, b, c, 8, tile_cap=_cap)))
            try:
                dt = loop_t(f, q, k, v, iters=4, inner=8, perturb=pert)
                print(f"{label:12s} cap={cap:2d}: {dt * 1000:8.1f} us/call",
                      flush=True)
            except Exception as e:
                print(f"{label:12s} cap={cap:2d}: FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)


if __name__ == "__main__":
    main()
