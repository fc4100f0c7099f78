"""Compare train-ingest formulations on the real chip @B=240.

Round-3 finding: the two take_along_axis crop gathers in
data/pipeline.py::device_ingest cost 21.8 ms @B=240 (eval static slice:
0.9 ms), and the Pallas per-clip kernel (ops/ingest.py) is even slower
end-to-end (+13 ms on the full train step) -- its per-frame Python loop
issues 7200 tiny (88x88) MXU dots and 18 selects per frame.

Variants measured here:
  gather  -- current production path (take_along_axis rows then cols)
  select  -- 9-way static-slice jnp.where per crop axis in uint8, then
             cast/normalize/flip (offsets are bounded by MAX_OFFSET=8,
             cvtransforms.py:28-29, so each axis is a 9-way select over
             shifted slices -- pure elementwise, fuses into one
             bandwidth-bound loop, no gather engine)
  select_barrier -- same, with an optimization_barrier between the row
             and column stages (guards against XLA over-fusing 81
             candidate reads into one kernel)

Run: python -u tools/ingest_variant_probe.py  (TPU, ~2 min)
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import loop_t
from sbl_for_multilingual_lip_reading_tpu.data.pipeline import device_ingest
from sbl_for_multilingual_lip_reading_tpu.data.transforms import MEAN, STD

B, T, RAW, CROP = 240, 30, 96, 88
MAXO = RAW - CROP  # 8


def select_ingest(clips_u8, offsets, flip, frame_map, crop, dtype,
                  barrier=False):
    B, T, H, W = clips_u8.shape
    clips = jnp.take_along_axis(clips_u8, frame_map[:, :, None, None],
                                axis=1)
    dy = offsets[..., 0][:, :, None, None]
    dx = offsets[..., 1][:, :, None, None]
    acc = clips[:, :, 0:crop, :]
    for k in range(1, H - crop + 1):
        acc = jnp.where(dy == k, clips[:, :, k:k + crop, :], acc)
    if barrier:
        acc = jax.lax.optimization_barrier(acc)
    out = acc[:, :, :, 0:crop]
    for k in range(1, W - crop + 1):
        out = jnp.where(dx == k, acc[:, :, :, k:k + crop], out)
    x = out.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - MEAN) / STD
    x = jnp.where(flip[:, None, None, None], x[:, :, :, ::-1], x)
    return x.astype(dtype)


def main():
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 256, (B, T, RAW, RAW),
                                     dtype=np.uint8))
    offs = jnp.asarray(rng.integers(0, MAXO + 1, (B, T, 2), dtype=np.int32))
    flip = jnp.asarray(rng.random(B) < 0.5)
    fmap = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    variants = {
        "gather": jax.jit(lambda c: device_ingest(
            c, offs, flip, fmap, CROP, jnp.bfloat16)),
        "select": jax.jit(lambda c: select_ingest(
            c, offs, flip, fmap, CROP, jnp.bfloat16)),
        "select_barrier": jax.jit(lambda c: select_ingest(
            c, offs, flip, fmap, CROP, jnp.bfloat16, barrier=True)),
    }
    # parity first (vs the production gather path)
    ref = np.asarray(variants["gather"](clips), np.float32)
    for name in ("select", "select_barrier"):
        got = np.asarray(variants[name](clips), np.float32)
        ok = np.allclose(ref, got, atol=1e-2)
        print(f"parity {name}: {'OK' if ok else 'MISMATCH'}")
        assert ok
    pert = lambda a, i: (a[0] + np.uint8(i + 1),)
    for name, fn in variants.items():
        t = loop_t(fn, clips, iters=10, perturb=pert, inner=8)
        print(f"{name:16s} {t:7.3f} ms")


if __name__ == "__main__":
    main()
