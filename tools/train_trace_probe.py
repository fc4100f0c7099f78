"""Per-op device-clock attribution of the SBL training step via XPlane.

tools/train_split_probe.py gives the fwd/bwd/full wall-clock split; this
probe answers WHERE the backward's time goes by tracing the production
train step with jax.profiler and reporting per-HLO-op device busy time
(tools/trace_probe.py parser).  Motivation: frontend fwd+bwd is 215 ms
for a ~100 ms fwd whose convs already run at only ~24% MXU -- the conv
gradients (input-grad and filter-grad convolutions) are the suspected
cold spot (CLAUDE.md round-3 notes).

Reports two traces: the full train step and the fwd-only loss, so ops
that appear only in the former are backward-side.  Convolution ops are
additionally aggregated into a fwd-vs-bwd summary (backward convs are
recognizable by name: XLA emits distinct %convolution ops for the
input/filter gradients, and remat recomputes show up as extra counts).

Usage: [BENCH_B=240] [TRACE_ITERS=3] [TRACE_ROWS=30]
       python tools/train_trace_probe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.trace_probe import parse_xplanes, report


def main():
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.training.loss import (
        cal_performance)
    from sbl_for_multilingual_lip_reading_tpu.training.steps import (
        _ingest_train, make_sbl_train_step)
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        init_state)

    import dataclasses
    if os.environ.get("TINY"):
        # CPU smoke of the probe harness itself
        jax.config.update("jax_platforms", "cpu")
        cfg = C.tiny_test("sbl")
        B = int(os.environ.get("BENCH_B", "4"))
    else:
        cfg = C.sbl()
        B = int(os.environ.get("BENCH_B", "240"))
    if os.environ.get("REMAT_FRONTEND"):
        cfg = dataclasses.replace(cfg, remat_frontend=True)
    if os.environ.get("SCAN_UNROLL"):
        cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
            cfg.decoder, scan_unroll=int(os.environ["SCAN_UNROLL"])))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    T, raw, crop = cfg.data.frames, cfg.data.raw_size, cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)
    smoothing = cfg.optim.label_smoothing

    state, tx = init_state(model, cfg, rng)
    train_step = make_sbl_train_step(model, tx, cfg)

    rng_np = np.random.default_rng(0)
    batch = {
        "clip_u8": jnp.asarray(rng_np.integers(
            0, 256, size=(B, T, raw, raw), dtype=np.uint8)),
        "labels": jnp.asarray(rng_np.integers(
            4, 40, size=(B, cfg.decoder.target_pad_len), dtype=np.int32)),
        "labels_reverse": jnp.asarray(rng_np.integers(
            4, 40, size=(B, cfg.decoder.target_pad_len), dtype=np.int32)),
        "offsets": jnp.asarray(rng_np.integers(
            0, 9, size=(B, T, 2), dtype=np.int32)),
        "flip": jnp.asarray(rng_np.random(B) < 0.5),
        "frame_map": jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32),
                                      (B, T)),
    }

    if os.environ.get("PROD"):
        # PRODUCTION trace: the donated train step exactly as Trainer.fit
        # dispatches it (new_state is a jit OUTPUT, so nothing is DCE'd and
        # no anchor reductions pollute the attribution -- the anchored
        # variant below showed ~45 ms/iter of per-leaf f32[] sum-of-squares
        # fusions that are pure probe overhead).  State evolves across
        # iters (rng folds in state.step), so dispatches are never
        # value-identical.
        step_d = make_sbl_train_step(model, tx, cfg, donate=True)
        state, m = step_d(state, batch, jax.random.PRNGKey(7))
        float(m["loss"])  # sync after compile
        iters = int(os.environ.get("TRACE_ITERS", "3"))
        tdir = "/tmp/trace_trainprod"
        with jax.profiler.trace(tdir):
            for i in range(iters):
                b = dict(batch)
                b["clip_u8"] = b["clip_u8"] + np.uint8(i + 1)
                state, m = step_d(state, b, jax.random.PRNGKey(7))
            float(m["loss"])
        report(tdir, "trainprod", iters)
        return

    def _anchor(tree):
        # depend on every leaf so XLA can't DCE the update (see
        # train_split_probe)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def full(state, batch, rng):
        new_state, m = train_step(state, batch, rng)
        return m["loss"] + _anchor(new_state.params)

    def loss_of(params, bs, video, labels, labels_rev, rng):
        drop_rng, teach_rng = jax.random.split(rng)
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, video, labels,
            labels_rev, train=True,
            rngs={"dropout": drop_rng, "teacher": teach_rng},
            mutable=["batch_stats"])
        p_l2r, g_l2r, p_r2l, g_r2l = out
        l1, _ = cal_performance(p_l2r, g_l2r, smoothing)
        l2, _ = cal_performance(p_r2l, g_r2l, smoothing)
        return 0.5 * (l1 + l2)

    @jax.jit
    def fwd_only(state, batch, rng):
        video = _ingest_train(batch, crop, dtype)
        return loss_of(state.params, state.batch_stats, video,
                       batch["labels"], batch["labels_reverse"], rng)

    def fetch(out):
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      .reshape(-1)[:8]).astype(jnp.float32))

    iters = int(os.environ.get("TRACE_ITERS", "3"))
    rngk = jax.random.PRNGKey(7)
    conv = {}
    for label, fn in [("trainstep", full), ("trainfwd", fwd_only)]:
        fetch(fn(state, batch, rngk))  # compile outside the trace
        tdir = f"/tmp/trace_{label}"
        with jax.profiler.trace(tdir):
            for i in range(iters):
                b = dict(batch)
                b["clip_u8"] = b["clip_u8"] + np.uint8(i + 1)
                fetch(fn(state, b, rngk))
        report(tdir, label, iters)
        # conv summary: aggregate every op whose name mentions convolution,
        # preferring device planes (fall back to all planes on CPU, whose
        # ops land on the /host plane)
        rows = list(parse_xplanes(tdir))
        dev = [r for r in rows
               if "TPU" in r[0] or "device" in r[0].lower()]
        agg = {}
        for plane, name, dur, cnt in (dev or rows):
            if "conv" in name:
                agg[name] = (dur / 1e9 / iters, cnt)
        conv[label] = agg
        tot = sum(ms for ms, _ in agg.values())
        print(f"  {label}: {len(agg)} conv ops, {tot:.2f} ms/iter total",
              flush=True)
        for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
            print(f"    {name[:70]:70s} {ms:7.2f} ms/iter (n={cnt})",
                  flush=True)
    fwd_names = set(conv.get("trainfwd", {}))
    bwd_only = {k: v for k, v in conv.get("trainstep", {}).items()
                if k not in fwd_names}
    print(f"conv ops only in the full step (backward side): "
          f"{sum(ms for ms, _ in bwd_only.values()):.2f} ms/iter "
          f"over {len(bwd_only)} ops", flush=True)


if __name__ == "__main__":
    main()
