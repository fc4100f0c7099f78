"""On-chip loss-parity smoke for FusedBNAct (round-5 VERDICT item 2).

Runs a few full-dims SBL train steps twice -- use_fused_bn_act on vs off --
from the same init/params/data/rngs and compares the loss sequences.  The
fused op changes only what the backward STORES (ops/bn_relu.py); forward
math is the same statistics in f32, so losses must agree to reduction-
-order rounding.  CPU already pins grad parity (tests/test_bn_relu.py);
this validates the real-chip compile of both graphs end to end.

Usage:  python tools/fused_bn_parity.py   [BENCH_B=48 STEPS=3]
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(fused: bool, B: int, steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.training.steps import (
        make_sbl_train_step)
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        init_state)

    os.environ.pop("NO_FUSED_BN_ACT", None)
    os.environ.pop("FUSED_BN_ACT", None)
    if fused:
        os.environ["FUSED_BN_ACT"] = "1"   # default is OFF since round 5
    else:
        os.environ["NO_FUSED_BN_ACT"] = "1"

    cfg = C.sbl()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = init_state(model, cfg, rng)
    train_step = make_sbl_train_step(model, tx, cfg, donate=True)

    T, raw = cfg.data.frames, cfg.data.raw_size
    rng_np = np.random.default_rng(0)
    losses = []
    for i in range(steps):
        batch = {
            "clip_u8": jnp.asarray(rng_np.integers(
                0, 256, size=(B, T, raw, raw), dtype=np.uint8)),
            "labels": jnp.asarray(rng_np.integers(
                4, 40, size=(B, cfg.decoder.target_pad_len),
                dtype=np.int32)),
            "labels_reverse": jnp.asarray(rng_np.integers(
                4, 40, size=(B, cfg.decoder.target_pad_len),
                dtype=np.int32)),
            "offsets": jnp.asarray(rng_np.integers(
                0, 9, size=(B, T, 2), dtype=np.int32)),
            "flip": jnp.asarray(rng_np.random(B) < 0.5),
            "frame_map": jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32), (B, T)),
        }
        state, m = train_step(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
        print(f"  fused={fused} step {i}: loss {losses[-1]:.6f}", flush=True)
    return losses


def main():
    from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    B = int(os.environ.get("BENCH_B", "48"))
    steps = int(os.environ.get("STEPS", "3"))
    # subprocess per variant: the env knob is read at trace time and the
    # jit caches would otherwise alias
    import subprocess
    import json
    outs = {}
    for fused in (True, False):
        env = dict(os.environ, SBL_BN_PARITY_CHILD="1",
                   SBL_BN_PARITY_FUSED=str(int(fused)))
        env.pop("NO_FUSED_BN_ACT", None)
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        print(p.stdout, end="", flush=True)
        if p.returncode != 0:
            print(p.stderr[-3000:], flush=True)
            raise SystemExit(f"child fused={fused} failed rc={p.returncode}")
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("LOSSES ")][-1]
        outs[fused] = json.loads(line[len("LOSSES "):])
    import numpy as np
    a, b = np.asarray(outs[True]), np.asarray(outs[False])
    rel = np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-9))
    print(f"fused   : {outs[True]}")
    print(f"composed: {outs[False]}")
    print(f"max rel diff {rel:.2e} over {steps} steps @B={B}")
    assert rel < 5e-3, f"loss parity FAILED: {rel}"
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    if os.environ.get("SBL_BN_PARITY_CHILD"):
        import json
        from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache \
            import enable_compile_cache
        enable_compile_cache()
        fused = os.environ["SBL_BN_PARITY_FUSED"] == "1"
        losses = run(fused, int(os.environ.get("BENCH_B", "48")),
                     int(os.environ.get("STEPS", "3")))
        print("LOSSES " + json.dumps(losses), flush=True)
    else:
        main()
