"""Device-clock split of the SBL training step: fwd / bwd / optimizer.

The inference path got a full trace-driven optimization campaign in round
2; this is the training-side equivalent of tools/split_probe.py.  All
timings use the robust loop protocol (perturbed inputs + amortized
fetches, tools/tpu_timing.py) -- never naive block_until_ready.

Measures, at the reference batch (default 240, dropout active):
  fwd        -- loss computation only (no grad)
  fwd+bwd    -- jax.grad of the loss (includes remat recompute)
  full       -- the production train_step (grad + optimizer update)
  update     ~= full - fwd+bwd;   bwd ~= fwd+bwd - fwd
plus an attribution split: frontend-only and decoder-only fwd+bwd.

Env: BENCH_B, NO_PALLAS_ATTN=1 (einsum-path ablation), DROPOUT0=1,
SCAN_UNROLL=k (decoder scan unroll factor).
Usage: python tools/train_split_probe.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timing import loop_t


def main():
    from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache import (
        enable_compile_cache)

    # compile time only, never the measured execution; bracketed A/B runs
    # (baseline / ablation / baseline) re-use the baseline executable
    enable_compile_cache()
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import (
        device_ingest)
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.training.loss import (
        cal_performance)
    from sbl_for_multilingual_lip_reading_tpu.training.steps import (
        _ingest_train, make_sbl_train_step)
    from sbl_for_multilingual_lip_reading_tpu.training.schedule import (
        make_optimizer)
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        init_state)

    cfg = C.sbl()
    if os.environ.get("NO_PALLAS_ATTN"):
        cfg = dataclasses.replace(cfg, use_pallas_attention=False)
    if os.environ.get("DROPOUT0"):
        cfg = dataclasses.replace(
            cfg, dims=dataclasses.replace(cfg.dims, dropout=0.0),
            frontend=dataclasses.replace(cfg.frontend, dropout=0.0))
    if os.environ.get("NO_REMAT_FRONTEND"):
        cfg = dataclasses.replace(cfg, remat_frontend=False)
    elif os.environ.get("REMAT_FRONTEND"):
        # default flipped to False in round 3; knob re-measures the ON case
        cfg = dataclasses.replace(cfg, remat_frontend=True)
    if os.environ.get("NO_REMAT_DECODER"):
        cfg = dataclasses.replace(cfg, remat_decoder=False)
    if os.environ.get("SCAN_UNROLL"):
        cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
            cfg.decoder, scan_unroll=int(os.environ["SCAN_UNROLL"])))
    if os.environ.get("GRAD_ACCUM_BF16"):
        cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
            cfg.decoder, grad_accum_bf16=True))
    B = int(os.environ.get("BENCH_B", "240"))
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    T, raw, crop = cfg.data.frames, cfg.data.raw_size, cfg.data.crop_size
    dtype = jnp.dtype(cfg.compute_dtype)
    smoothing = cfg.optim.label_smoothing

    state, tx = init_state(model, cfg, rng)
    # DONATE=1: measure the donating executable (Trainer default on TPU).
    # Only meaningful with JOBS=prod -- the anchored jobs re-call on the
    # same state, which a donating step forbids.
    train_step = make_sbl_train_step(model, tx, cfg,
                                     donate=bool(os.environ.get("DONATE")))

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

    def _anchor(tree):
        # depend on EVERY leaf: returning a single leaf lets XLA dead-code
        # -eliminate the rest of the backward/update (measured: "full step"
        # timed faster than fwd+bwd before this)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                   for l in jax.tree_util.tree_leaves(tree))

    @jax.jit
    def fwd_bwd(state, batch, rng):
        video = _ingest_train(batch, crop, dtype)
        g = jax.grad(lambda p: loss_of(p, state.batch_stats, video,
                                       batch["labels"],
                                       batch["labels_reverse"], rng))(
            state.params)
        return _anchor(g)

    @jax.jit
    def full(state, batch, rng):
        new_state, m = train_step(state, batch, rng)
        return m["loss"] + _anchor(new_state.params)

    # attribution: frontend / encoder+decoder fwd+bwd separately
    video0 = jax.jit(lambda b: _ingest_train(b, crop, dtype))(batch)
    feats0 = jax.jit(lambda s, v: model.apply(
        {"params": s.params, "batch_stats": s.batch_stats},
        method=lambda m: m.frontend(v[..., None], train=False,
                                    deterministic=True)))(state, video0)

    @jax.jit
    def frontend_fb(state, video, rng):
        def f(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                method=lambda m: m.frontend(video[..., None], train=True,
                                            deterministic=False),
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        g = jax.grad(f)(state.params)
        return _anchor(g["frontend"])

    @jax.jit
    def decoder_fb(state, feats, batch, rng):
        drop_rng, teach_rng = jax.random.split(rng)

        def f(p):
            enc = model.apply({"params": p, "batch_stats": state.batch_stats},
                              method=lambda m: m.encoder(
                                  feats, deterministic=False),
                              rngs={"dropout": drop_rng})
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                method=lambda m: m.decoder(batch["labels"],
                                           batch["labels_reverse"], enc,
                                           deterministic=False),
                rngs={"dropout": drop_rng, "teacher": teach_rng})
            p_l2r, g_l2r, p_r2l, g_r2l = out
            l1, _ = cal_performance(p_l2r, g_l2r, smoothing)
            l2, _ = cal_performance(p_r2l, g_r2l, smoothing)
            return 0.5 * (l1 + l2)
        g = jax.grad(f)(state.params)
        return _anchor({"d": g["decoder"], "e": g["encoder"]})

    def perturb_batch(args, i):
        s, b = args[0], dict(args[1])
        b["clip_u8"] = b["clip_u8"] + np.uint8(i + 1)
        return (s, b) + args[2:]

    rngk = jax.random.PRNGKey(7)

    def prod_t(iters, inner, reps):
        """Time the PRODUCTION train_step: state chains through itself (the
        param update is a live output, so nothing needs a DCE anchor) and
        only the loss scalar is fetched.  MEASURED (calm, 2026-08-18):
        435.9 ms vs the anchored ``full`` job's 427.0 @B=240 -- the anchor
        does NOT inflate the reading (XLA fuses its per-leaf reductions
        into the update epilogues and in exchange skips materializing the
        ~560 MB of new param/opt buffers the chained mode must write), so
        both protocols agree within run noise and cross-validate the
        563 clips/s number."""
        import time
        from tools.tpu_timing import _touch
        s, m = train_step(state, batch, rngk)
        _touch(m["loss"])
        dts, rts = [], []
        n = 0
        for r in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                for _ in range(inner):
                    b = dict(batch)
                    b["clip_u8"] = b["clip_u8"] + np.uint8(n % 251 + 1)
                    n += 1
                    s, m = train_step(s, b, rngk)
                _touch(m["loss"], salt=r + 1)
            dts.append(time.perf_counter() - t0)
            t1 = time.perf_counter()
            for k in range(iters):
                _touch(m["loss"], salt=k + 1)
            rts.append(time.perf_counter() - t1)
        dt = min(dts) / (iters * inner) * 1000.0
        rt = min(rts) / (iters * inner) * 1000.0
        return dt - rt
    jobs = [
        ("fwd      ", fwd_only, (state, batch, rngk), perturb_batch),
        ("fwd+bwd  ", fwd_bwd, (state, batch, rngk), perturb_batch),
        ("full step", full, (state, batch, rngk), perturb_batch),
        ("frontend fwd+bwd", frontend_fb, (state, video0, rngk),
         lambda a, i: (a[0], a[1] + jnp.asarray(0.001 * (i + 1),
                                                a[1].dtype), a[2])),
        ("decoder fwd+bwd ", decoder_fb, (state, feats0, batch, rngk),
         lambda a, i: (a[0], a[1] + jnp.asarray(0.001 * (i + 1),
                                                a[1].dtype)) + a[2:]),
    ]
    only = os.environ.get("JOBS")
    results = {}
    for name, fn, args, pert in jobs:
        if only and name.strip() not in [j.strip() for j in only.split(",")]:
            continue
        ms = loop_t(fn, *args, iters=int(os.environ.get("ITERS", "4")),
                    perturb=pert, inner=4,
                    reps=int(os.environ.get("REPS", "3")))
        results[name] = ms
        print(f"{name}: {ms:8.2f} ms/iter ({B / ms * 1000:7.1f} clips/s)",
              flush=True)
    if not only or "prod" in only:
        ms = prod_t(iters=int(os.environ.get("ITERS", "4")), inner=4,
                    reps=int(os.environ.get("REPS", "3")))
        results["prod step"] = ms
        from sbl_for_multilingual_lip_reading_tpu.utils import flops as F
        cps = B / ms * 1000
        print(f"prod step: {ms:8.2f} ms/iter ({cps:7.1f} clips/s, "
              f"train MFU {F.mfu(cps, F.train_flops_per_clip(cfg)):.3f})",
              flush=True)
    if not only:
        fwd = results["fwd      "]
        fb = results["fwd+bwd  "]
        fl = results["full step"]
        print(f"derived: bwd ~= {fb - fwd:.2f} ms, "
              f"optimizer ~= {fl - fb:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
