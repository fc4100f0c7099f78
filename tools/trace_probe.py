"""Ground-truth device timing via jax.profiler + XPlane parsing.

The wall-clock harnesses (tools/tpu_timing.py) fight the axon tunnel's
caching/sync quirks; a profiler trace sidesteps all of it by reading the
device's own event clock.  Captures a trace of N perturbed full-recognize
iterations (plus each component standalone), then parses the XPlane proto
(tensorflow.tsl.profiler.protobuf.xplane_pb2 -- present in the baked-in TF)
and reports per-XLA-module device busy time.

Usage: [NO_FUSED_LAYER=1] [BENCH_B=256] python tools/trace_probe.py
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def parse_xplanes(trace_dir):
    """Yield (plane_name, event_name, total_dur_ps, count) over all planes
    in the newest xplane.pb under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        agg = defaultdict(lambda: [0, 0])
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                a = agg[meta.name]
                a[0] += ev.duration_ps
                a[1] += 1
        for name, (dur, cnt) in agg.items():
            yield plane.name, name, dur, cnt


def report(trace_dir, label, iters):
    rows = list(parse_xplanes(trace_dir))
    planes = sorted({p for p, *_ in rows})
    print(f"--- {label}: planes {planes}", flush=True)
    dev = [r for r in rows if "TPU" in r[0] or "device" in r[0].lower()]
    use = dev if dev else rows
    if os.environ.get("FILTER_COPIES"):
        # copy-start/copy-done report async in-flight duration, which
        # overlaps compute and double-counts; drop them for a busy-time view
        use = [r for r in use if not r[1].startswith(("%copy-start",
                                                      "%copy-done"))]
    use = sorted(use, key=lambda r: -r[2])
    nrows = int(os.environ.get("TRACE_ROWS", "18"))
    for plane, name, dur, cnt in use[:nrows]:
        ms = dur / 1e9
        print(f"  {plane[:28]:28s} {name[:64]:64s} {ms:9.2f} ms total "
              f"({ms / iters:7.2f}/iter, n={cnt})", flush=True)


def main():
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import device_ingest
    from sbl_for_multilingual_lip_reading_tpu.models import build_model

    cfg = C.sbl()
    if os.environ.get("NO_FUSED_LAYER"):
        import dataclasses
        cfg = dataclasses.replace(cfg, use_fused_decoder_layer=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    B = int(os.environ.get("BENCH_B", "256"))
    T, raw, crop = cfg.data.frames, cfg.data.raw_size, cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)

    labels = jnp.zeros((2, cfg.decoder.target_pad_len), jnp.int32)
    init_video = jnp.zeros((2, T, crop, crop), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": rng, "dropout": rng, "teacher": rng},
                           init_video, labels, labels, train=False))()

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

    clips = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, size=(B, T, raw, raw), dtype=np.uint8))
    video = jax.block_until_ready(ingest(variables, clips))
    feats = jax.block_until_ready(frontend(variables, video))
    enc = jax.block_until_ready(encoder(variables, feats))

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.reshape(-1)[:8]).astype(jnp.float32))

    iters = int(os.environ.get("TRACE_ITERS", "5"))
    jobs = [("full", full, clips, True),
            ("ingest", ingest, clips, True),
            ("frontend", frontend, video, False),
            ("encoder", encoder, feats, False),
            ("decode", decode, enc, False)]
    only = os.environ.get("TRACE_ONLY")
    for label, fn, arg, is_u8 in jobs:
        if only and label not in only.split(","):
            continue
        fetch(fn(variables, arg))  # compile outside the trace
        tdir = f"/tmp/trace_{label}"
        with jax.profiler.trace(tdir):
            for i in range(iters):
                a = (arg + np.uint8(i + 1) if is_u8
                     else arg + jnp.asarray(0.001 * (i + 1), arg.dtype))
                fetch(fn(variables, a))
        report(tdir, label, iters)


if __name__ == "__main__":
    main()
