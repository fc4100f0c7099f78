"""Mosaic legality/timing probe: building the 9-tap im2col patch tensor
inside a Pallas kernel.

The naive ``concat([vp[:, ky:ky+S, kx:kx+S, :] ...], -1)`` fails to
compile: the shifted slices carry different sublane/lane offsets and
tpu.concatenate requires matching offsets on non-concat dims.  Candidate
fixes, each compiled + timed at the stage-1 shape:

  scratch  -- store each tap into a VMEM scratch at its channel offset
              (stores normalize layout), read back, one K=9C dot
  roll     -- roll the padded tensor so every tap is a slice at offset 0
  padded   -- rebuild each tap with lax.pad of an interior slice
  ninedots -- 9 accumulating K=C dots (the ~25% MXU baseline shape)

Usage: python tools/concat_probe.py [--shape 8,22,64]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.tpu_timing import chain_t


def make_fn(variant, N, S, C, Bt):
    K = 9 * C

    def taps_concat_scratch(xv, scratch):
        vp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for ky in range(3):
            for kx in range(3):
                k = ky * 3 + kx
                scratch[:, :, :, k * C:(k + 1) * C] = \
                    vp[:, ky:ky + S, kx:kx + S, :]
        return scratch[...]

    def taps_roll(xv):
        vp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = []
        for ky in range(3):
            for kx in range(3):
                r = jnp.roll(vp, (-ky, -kx), axis=(1, 2))
                cols.append(r[:, :S, :S, :])
        return jnp.concatenate(cols, axis=-1)

    def taps_padded(xv):
        cols = []
        for ky in range(3):
            for kx in range(3):
                dy, dx = ky - 1, kx - 1
                lo_y, hi_y = max(0, -dy), max(0, dy)
                lo_x, hi_x = max(0, -dx), max(0, dx)
                core = xv[:, hi_y:S - lo_y or S, hi_x:S - lo_x or S, :]
                core = xv[:, max(0, dy):S + min(0, dy),
                          max(0, dx):S + min(0, dx), :]
                t = jax.lax.pad(core, jnp.zeros((), xv.dtype),
                                ((0, 0, 0),
                                 (max(0, -dy), max(0, dy), 0),
                                 (max(0, -dx), max(0, dx), 0),
                                 (0, 0, 0)))
                cols.append(t)
        return jnp.concatenate(cols, axis=-1)

    def kernel(x_ref, w_ref, o_ref, *scratch):
        xv = x_ref[...]
        if variant == "scratch":
            pat = taps_concat_scratch(xv, scratch[0])
        elif variant == "roll":
            pat = taps_roll(xv)
        elif variant == "padded":
            pat = taps_padded(xv)
        elif variant == "ninedots":
            vp = jnp.pad(xv, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((Bt * S * S, C), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    k = ky * 3 + kx
                    tap = vp[:, ky:ky + S, kx:kx + S, :]
                    acc = acc + jax.lax.dot_general(
                        tap.reshape(Bt * S * S, C),
                        w_ref[k * C:(k + 1) * C, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            o_ref[...] = acc.reshape(Bt, S, S, C).astype(o_ref.dtype)
            return
        out = jax.lax.dot_general(
            pat.reshape(Bt * S * S, K), w_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[...] = out.reshape(Bt, S, S, C).astype(o_ref.dtype)

    scratch_shapes = ([pltpu.VMEM((Bt, S, S, K), jnp.bfloat16)]
                      if variant == "scratch" else [])

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, S, S, C), x.dtype),
            grid=(N // Bt,),
            in_specs=[pl.BlockSpec((Bt, S, S, C), lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec((K, C), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((Bt, S, S, C), lambda i: (i, 0, 0, 0)),
            scratch_shapes=scratch_shapes,
        )(x, w)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=str, default="7680,22,64")
    ap.add_argument("--tile", type=int, default=8)
    args = ap.parse_args()
    N, S, C = (int(v) for v in args.shape.split(","))
    Bt = args.tile
    rng = jax.random.PRNGKey(0)
    x = (jax.random.normal(rng, (N, S, S, C)) * 0.3).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.fold_in(rng, 1), (9 * C, C))
         * 0.05).astype(jnp.bfloat16)

    # XLA conv reference for numerics
    w4 = w.reshape(3, 3, C, C)
    ref = jax.jit(lambda x: jax.lax.conv_general_dilated(
        x, w4, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    refv = np.asarray(ref(x)[:32]).astype(np.float32)
    gf = 2 * N * S * S * 9 * C * C / 1e9

    for variant in ("scratch", "roll", "padded", "ninedots"):
        try:
            fn = make_fn(variant, N, S, C, Bt)
            got = np.asarray(fn(x, w)[:32]).astype(np.float32)
            err = np.abs(got - refv).max()
            t = chain_t(lambda v: fn(v, w), x, iters=6, inner=8)
            print(f"{variant:9s}: |err|={err:.4f}  {t:7.2f} ms "
                  f"({gf / t:6.1f} GF/ms)", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{variant:9s}: FAILED {msg}", flush=True)


if __name__ == "__main__":
    main()
