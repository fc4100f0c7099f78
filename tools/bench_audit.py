"""Audit the end-to-end inference bench against timing-harness artifacts.

Times the full bench.py recognize path two ways:
* legacy: 20 identical-input dispatches, block_until_ready at the end
  (bench.py round 1 -- BENCH_r01.json 1952.77 clips/s);
* robust: perturbed input each iteration + per-iteration result fetch
  (tools/tpu_timing.py, see its docstring for the two measured failure
  modes of the legacy method).
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


def main():
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import device_ingest
    from sbl_for_multilingual_lip_reading_tpu.models import build_model

    cfg = C.sbl()
    if os.environ.get("NO_FUSED_LAYER"):
        import dataclasses
        cfg = dataclasses.replace(cfg, use_fused_decoder_layer=False)
    if os.environ.get("SEGMENTS"):
        import dataclasses
        cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
            cfg.decoder, decode_segments=int(os.environ["SEGMENTS"])))
    if os.environ.get("NO_PALLAS_ATTN"):
        import dataclasses
        cfg = dataclasses.replace(cfg, use_pallas_attention=False)
    no_stem = bool(os.environ.get("NO_PALLAS_STEM"))
    model = build_model(cfg)
    if no_stem:
        import dataclasses
        model = dataclasses.replace(model, frontend=dataclasses.replace(
            model.frontend, use_pallas_stem=False))
    if os.environ.get("PALLAS_RESBLOCK"):
        # default-off experiment (ops/resblock.py: measured slower)
        import dataclasses
        model = dataclasses.replace(model, frontend=dataclasses.replace(
            model.frontend, use_pallas_resblock=True))
    rng = jax.random.PRNGKey(0)
    B = int(os.environ.get("BENCH_B", "256"))
    T, raw, crop = cfg.data.frames, cfg.data.raw_size, cfg.data.crop_size

    labels = jnp.zeros((2, cfg.decoder.target_pad_len), jnp.int32)
    init_video = jnp.zeros((2, T, crop, crop), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": rng, "dropout": rng, "teacher": rng},
                           init_video, labels, labels, train=False))()
    dtype = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def _recognize(variables, clips_u8):
        # variables must be an ARGUMENT: closed-over param trees are
        # serialized into the remote-compile request body, which the axon
        # helper rejects with HTTP 413 at full dims (~280 MB fp32).
        video = device_ingest(clips_u8, None, None, None, crop, dtype)
        return model.apply(variables, video, method=model.recognize)

    def recognize_batch(clips_u8):
        return _recognize(variables, clips_u8)

    clips = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(B, T, raw, raw),
                                          dtype=np.uint8))
    ys = jax.block_until_ready(recognize_batch(clips))

    # legacy timing
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        ys = recognize_batch(clips)
    jax.block_until_ready(ys)
    legacy = (time.perf_counter() - t0) / iters * 1000.0
    print(f"legacy  identical-input: {legacy:8.2f} ms/iter "
          f"({B / legacy * 1000:8.1f} clips/s)", flush=True)

    # robust timing (new input values each iteration, fetched results)
    def perturb(args, i):
        return ((args[0] + np.uint8(i + 1)),)

    # inner=4 amortizes the per-fetch tunnel sync; reps=3 + min/min defends
    # against multi-second congestion stalls landing inside one block
    # (see tpu_timing.loop_t docstring / bench.py history, round 3)
    robust = loop_t(recognize_batch, clips, iters=5, perturb=perturb,
                    inner=4, reps=3)
    print(f"robust  perturbed-input: {robust:8.2f} ms/iter "
          f"({B / robust * 1000:8.1f} clips/s)", flush=True)


if __name__ == "__main__":
    main()
