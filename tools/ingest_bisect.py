"""Bisect which construct in ops/ingest.py kills the TPU compile helper.

The full kernel dies with `remote_compile: HTTP 500` (subprocess crash, no
diagnostics).  Build it up construct-by-construct on a tiny shape.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, W, crop = 4, 6, 96, 96, 88


def run(name, kernel, n_prefetch=3):
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 256, (B, T, H, W), dtype=np.uint8))
    oy = jnp.asarray(rng.integers(0, 9, (B, T), dtype=np.int32))
    ox = jnp.asarray(rng.integers(0, 9, (B, T), dtype=np.int32))
    fm = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, H, W), lambda b, *_: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, T, crop, crop),
                               lambda b, *_: (b, 0, 0, 0)),
    )
    try:
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, T, crop, crop), jnp.float32),
        )(oy, ox, fm, clips)
        jax.block_until_ready(out)
        print(f"OK    {name}", flush=True)
        return True
    except Exception as e:
        print(f"FAIL  {name}: {str(e).splitlines()[0][:100]}", flush=True)
        return False


def k_static(oy, ox, fm, x_ref, o_ref):
    # static slices only, u8 -> i32 -> f32
    for t in range(T):
        f = x_ref[0, t, 0:crop, :].astype(jnp.int32).astype(jnp.float32)
        o_ref[0, t] = f[:, 0:crop]


def k_dyn_frame(oy, ox, fm, x_ref, o_ref):
    # dynamic frame index from SMEM
    b = pl.program_id(0)
    for t in range(T):
        src = fm[b, t]
        f = x_ref[0, pl.ds(src, 1), 0:crop, :][0]
        f = f.astype(jnp.int32).astype(jnp.float32)
        o_ref[0, t] = f[:, 0:crop]


def k_dyn_row(oy, ox, fm, x_ref, o_ref):
    # + dynamic row (sublane) start
    b = pl.program_id(0)
    for t in range(T):
        src = fm[b, t]
        dy = oy[b, t]
        f = x_ref[0, pl.ds(src, 1), pl.ds(dy, crop), :][0]
        f = f.astype(jnp.int32).astype(jnp.float32)
        o_ref[0, t] = f[:, 0:crop]


def k_select(oy, ox, fm, x_ref, o_ref):
    # + 9-way lane-slice select
    b = pl.program_id(0)
    for t in range(T):
        src = fm[b, t]
        dy = oy[b, t]
        dx = ox[b, t]
        f = x_ref[0, pl.ds(src, 1), pl.ds(dy, crop), :][0]
        f = f.astype(jnp.int32).astype(jnp.float32)
        out = jnp.zeros((crop, crop), jnp.float32)
        for k in range(9):
            out = jnp.where(dx == k, f[:, k:k + crop], out)
        o_ref[0, t] = out


def k_dot(oy, ox, fm, x_ref, o_ref):
    # + antidiagonal dot flip
    b = pl.program_id(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 1)
    rev_p = (ii + jj == crop - 1).astype(jnp.float32)
    for t in range(T):
        src = fm[b, t]
        dy = oy[b, t]
        dx = ox[b, t]
        f = x_ref[0, pl.ds(src, 1), pl.ds(dy, crop), :][0]
        f = f.astype(jnp.int32).astype(jnp.float32)
        out = jnp.zeros((crop, crop), jnp.float32)
        for k in range(9):
            out = jnp.where(dx == k, f[:, k:k + crop], out)
        flipped = jax.lax.dot(out, rev_p, preferred_element_type=jnp.float32)
        out = jnp.where((b % 2) == 0, flipped, out)
        o_ref[0, t] = out


def k_row_select(oy, ox, fm, x_ref, o_ref):
    # dyn row replaced by a 9-way static sublane-slice select
    b = pl.program_id(0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 1)
    rev_p = (ii + jj == crop - 1).astype(jnp.float32)
    for t in range(T):
        src = fm[b, t]
        dy = oy[b, t]
        dx = ox[b, t]
        f = x_ref[0, pl.ds(src, 1), :, :][0]
        f = f.astype(jnp.int32).astype(jnp.float32)      # (H, W)
        row = jnp.zeros((crop, W), jnp.float32)
        for k in range(9):
            row = jnp.where(dy == k, f[k:k + crop, :], row)
        out = jnp.zeros((crop, crop), jnp.float32)
        for k in range(9):
            out = jnp.where(dx == k, row[:, k:k + crop], out)
        flipped = jax.lax.dot(out, rev_p, preferred_element_type=jnp.float32)
        out = jnp.where((b % 2) == 0, flipped, out)
        o_ref[0, t] = out


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    steps = [("static slices", k_static), ("dyn frame", k_dyn_frame),
             ("dyn row", k_dyn_row), ("9-way select", k_select),
             ("dot flip", k_dot),
             ("row select full", k_row_select)]
    names = sys.argv[1:]
    for name, k in steps:
        if names and not any(n in name for n in names):
            continue
        run(name, k)
