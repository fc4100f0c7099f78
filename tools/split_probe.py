"""Honest per-component timing of the inference path (tools/tpu_timing).

Round-1's component split (frontend 55.5ms / encoder 4.4ms / decode 64.4ms
@B=256, CLAUDE.md) was measured with the broken block_until_ready harness;
this re-measures each stage with perturbed inputs + per-iteration result
fetch so the numbers are real.  NO_FUSED_LAYER=1 selects the XLA-composed
decoder layer; BENCH_BS="64,256" sweeps batch sizes.

Single-B standalone numbers include a large fixed dispatch/transport
overhead through the axon tunnel (measured: ingest alone "76 ms" while the
full pipeline containing it runs 128 ms), so the per-clip cost of each
stage is reported as the SLOPE between two batch sizes -- fixed overheads
cancel in the difference.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import loop_t


def measure(cfg, model, variables, B):
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import device_ingest

    T, raw, crop = cfg.data.frames, cfg.data.raw_size, cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)
    rng_np = np.random.default_rng(0)
    clips = jnp.asarray(rng_np.integers(0, 256, size=(B, T, raw, raw),
                                        dtype=np.uint8))

    @jax.jit
    def ingest(v, clips_u8):
        del v
        return device_ingest(clips_u8, None, None, None, crop, dtype)

    @jax.jit
    def frontend(v, video):
        return model.apply(
            v, method=lambda m: m.frontend(video[..., None], train=False,
                                           deterministic=True))

    @jax.jit
    def encoder(v, feats):
        return model.apply(
            v, method=lambda m: m.encoder(feats, deterministic=True))

    @jax.jit
    def decode(v, enc):
        return model.apply(v, method=lambda m: m.decoder.recognize(enc))

    @jax.jit
    def full(v, clips_u8):
        video = ingest(None, clips_u8)
        return model.apply(v, video, method=model.recognize)

    def pclips(args, i):
        return (args[0], args[1] + np.uint8(i + 1))

    def pfloat(args, i):
        return (args[0], args[1] + jnp.asarray(0.001 * (i + 1),
                                               args[1].dtype))

    video = jax.block_until_ready(ingest(variables, clips))
    feats = jax.block_until_ready(frontend(variables, video))
    enc = jax.block_until_ready(encoder(variables, feats))

    out = {}
    for name, fn, args, pert in [
            ("ingest", ingest, (variables, clips), pclips),
            ("frontend", frontend, (variables, video), pfloat),
            ("encoder", encoder, (variables, feats), pfloat),
            ("decode", decode, (variables, enc), pfloat),
            ("full", full, (variables, clips), pclips)]:
        dt = loop_t(fn, *args,
                    iters=int(os.environ.get("SPLIT_ITERS", "4")),
                    inner=int(os.environ.get("SPLIT_INNER", "8")),
                    perturb=pert)
        out[name] = dt
        print(f"  B={B:4d} {name:10s} {dt:8.2f} ms", flush=True)
    return out


def main():
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.models import build_model

    cfg = C.sbl()
    if os.environ.get("NO_FUSED_LAYER"):
        import dataclasses
        cfg = dataclasses.replace(cfg, use_fused_decoder_layer=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    T, crop = cfg.data.frames, cfg.data.crop_size

    labels = jnp.zeros((2, cfg.decoder.target_pad_len), jnp.int32)
    init_video = jnp.zeros((2, T, crop, crop), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": rng, "dropout": rng, "teacher": rng},
                           init_video, labels, labels, train=False))()

    bs = [int(b) for b in os.environ.get("BENCH_BS", "64,256").split(",")]
    res = {B: measure(cfg, model, variables, B) for B in bs}
    if len(bs) >= 2:
        b0, b1 = bs[0], bs[-1]
        print(f"\nper-clip slope between B={b0} and B={b1} "
              f"(fixed overhead cancelled):")
        tot = 0.0
        for name in ("ingest", "frontend", "encoder", "decode"):
            us = (res[b1][name] - res[b0][name]) / (b1 - b0) * 1000.0
            tot += us
            print(f"  {name:10s} {us:8.1f} us/clip "
                  f"({1e6 / us if us > 0 else float('inf'):8.1f} clips/s)",
                  flush=True)
        usf = (res[b1]["full"] - res[b0]["full"]) / (b1 - b0) * 1000.0
        print(f"  {'sum':10s} {tot:8.1f} us/clip")
        print(f"  {'full':10s} {usf:8.1f} us/clip "
              f"({1e6 / usf:8.1f} clips/s marginal)", flush=True)


if __name__ == "__main__":
    main()
