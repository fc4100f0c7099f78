"""Pallas training-ingest kernel: fused u8 -> bf16 crop/flip/gather.

STATUS: measured SLOWER than the select-based XLA formulation and kept
default-OFF (opt in with PALLAS_INGEST=1, training/steps.py).  The
original take_along_axis gathers cost 21.6 ms @B=240; this kernel made
the full train step 13 ms slower than that baseline (7200 per-frame
(88,88) MXU dots + 18 selects per frame dominate); the 9-way
static-slice select crop inside device_ingest runs 4.8 ms
(tools/ingest_variant_probe.py).  Kept for the Mosaic lowering lessons
documented below (u8 casts, dynamic sublane slices, rev).

The training ingest (data/pipeline.py::device_ingest with per-frame
offsets) originally lowered to two ``take_along_axis`` gathers over the
full clip batch -- measured 21.6 ms @B=240 vs the eval path's 0.9 ms
(static slice), ~40x over the ~0.5 ms bandwidth floor for the 66 MB u8
read + 111 MB bf16 write (tools/train_split_probe.py round 3).

This kernel does the whole plan application in ONE pass, one clip per
program, everything in VMEM:

* FrameRemoval: the source frame index is a dynamic sublane-block load
  (``frame_map`` rides in SMEM via scalar prefetch);
* row + column crop: 9-way masked selects over the 9 static slices each
  (offsets in [0, 8]) -- a dynamic-start sublane slice crashes the
  Mosaic compile helper (tools/ingest_bisect.py) and static slices +
  selects beat a dynamic rotate anyway;
* ColorNormalize (u8 -> i32 -> f32; Mosaic has no direct u8->f32 cast,
  tools/cast_probe.py) and whole-clip HorizontalFlip (a dot with the
  antidiagonal permutation -- Mosaic has no `rev`) fold into the pass.

Reference semantics: SBL data_gen.py:270-304 + cvtransforms.py (see
data/transforms.py); validated against ``apply_plan_host`` in
tests/test_ingest_kernel.py.  Not differentiable (no parameters are
upstream of ingest -- same argument as ops/stem.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import available, pltpu
from ..data.transforms import MEAN, STD

MAX_OFFSET = 8  # RandomCrop range [0, 8] (cvtransforms.py:28-29)


def ingest_train(clips_u8: jnp.ndarray, offsets: jnp.ndarray,
                 flip: jnp.ndarray, frame_map: jnp.ndarray, crop: int,
                 dtype=jnp.bfloat16,
                 n_frames: Optional[jnp.ndarray] = None,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """(B, T, H, W) u8 + integer plans -> (B, T, crop, crop) normalized.

    offsets: (B, T, 2) int32 per-frame (y, x) in [0, H-crop]; flip: (B,)
    bool; frame_map: (B, T) int32; n_frames: optional (B,) valid counts
    (pad slots zeroed AFTER normalization, data_gen.py:293-295).
    """
    B, T, H, W = clips_u8.shape
    assert H - crop <= MAX_OFFSET and W - crop <= MAX_OFFSET, \
        "offset range exceeds the static 9-way column select"
    if interpret is None:
        interpret = not available()
    inv_std = 1.0 / (255.0 * STD)
    shift = MEAN / STD
    have_n = n_frames is not None
    if not have_n:
        n_frames = jnp.full((B,), T, jnp.int32)

    # scalar-prefetch args (SMEM): flattened per-clip integer plans
    off_y = offsets[..., 0].astype(jnp.int32)            # (B, T)
    off_x = offsets[..., 1].astype(jnp.int32)            # (B, T)
    fmap = frame_map.astype(jnp.int32)                   # (B, T)
    flip_i = flip.astype(jnp.int32)                      # (B,)
    nf = n_frames.astype(jnp.int32)                      # (B,)

    def kernel(oy_ref, ox_ref, fm_ref, fl_ref, nf_ref, x_ref, o_ref):
        b = pl.program_id(0)
        do_flip = fl_ref[b] != 0
        nvalid = nf_ref[b]
        # Mosaic has no `rev` lowering: express the horizontal flip as a
        # dot with the antidiagonal permutation (out @ P)[r, j] =
        # out[r, crop-1-j] -- rides the MXU, ~0.1 ms total @B=240
        ii = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 1)
        rev_p = (ii + jj == crop - 1).astype(jnp.float32)
        for t in range(T):
            src = fm_ref[b, t]
            dy = oy_ref[b, t]
            dx = ox_ref[b, t]
            frame = x_ref[0, pl.ds(src, 1), :, :][0]
            # (H, W) u8; Mosaic has no u8->f32 cast -- hop through i32
            # (tools/cast_probe.py: u8->i32->f32 OK, u8->f32/bf16 FAIL)
            f = frame.astype(jnp.int32).astype(jnp.float32)
            # 9-way static slice selects for BOTH crop offsets: a dynamic
            # sublane-start slice (pl.ds on the row axis) crashes the
            # Mosaic compile helper (tools/ingest_bisect.py), and static
            # slices + selects beat a dynamic rotate anyway
            row = jnp.zeros((crop, W), jnp.float32)
            for k in range(MAX_OFFSET + 1):
                row = jnp.where(dy == k, f[k:k + crop, :], row)
            out = jnp.zeros((crop, crop), jnp.float32)
            for k in range(MAX_OFFSET + 1):
                out = jnp.where(dx == k, row[:, k:k + crop], out)
            # flip via the antidiagonal dot, selected per clip.  The MXU
            # truncates f32 operands to bf16, so the dot runs on the RAW
            # integer pixel values (0..255 -- exact in bf16; one nonzero
            # product per output element) and normalization follows.
            flipped = jax.lax.dot(out, rev_p,
                                  preferred_element_type=jnp.float32)
            out = jnp.where(do_flip, flipped, out)
            out = out * inv_std - shift
            if have_n:
                out = jnp.where(t < nvalid, out, 0.0)
            o_ref[0, t] = out.astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, H, W), lambda b, *_: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, T, crop, crop),
                               lambda b, *_: (b, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, crop, crop), dtype),
        interpret=interpret,
    )(off_y, off_x, fmap, flip_i, nf, clips_u8)
