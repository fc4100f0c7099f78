"""Pallas temporal-stack kernel for the Conv3D-as-2D stem.

The frontend reformulates the reference's ``Conv3d(1->64, k=(5,7,7))``
(video_frontend.py:110-118) as a 2-D conv over 5 temporally-shifted copies
of each frame stacked into input channels (models/frontend.py).  XLA builds
that 5-way stack with a chain of dynamic-update-slice fusions plus layout
copies -- measured ~6.7 ms/iter @B=256 on the device trace for ~600 MB of
output, an ~8x bandwidth overshoot, because each shifted copy is
materialized and relaid out separately.

This kernel writes the stacked tensor in ONE pass: per-clip grid, the
temporal pad is a leading-axis concat and each channel k is a leading-axis
slice ``padded[k:k+T]`` -- no transposes, no lane/sublane-misaligned ops.
Output is (B, T, 5, S, S) (flattened to (B*T, 5, S, S) NCHW by the
caller); the conv's dimension_numbers absorb the channel position, so the
layout XLA picks for the conv input is unchanged.

``stack_frames_u8`` additionally fuses the eval ingest (center crop +
ColorNormalize, data/pipeline.py::device_ingest) so a uint8 clip batch can
go HBM -> stacked bf16 in a single kernel.  NOT yet wired into any driver:
the eval path runs device_ingest (a pure slice since the static-crop fix,
~1.5 ms @B=256) followed by ``stack_frames``, and fusing them would need
the frontend to accept pre-stacked input; it also has no ``n_frames``
time-pad zeroing, so it only matches fixed-length (LRW-style) eval
batches.  Kept as the measured candidate for that future fusion.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import available
from ..data.transforms import MEAN, STD


def stack_frames(video: jnp.ndarray, kt: int = 5,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """(B, T, S, S) -> (B, T, kt, S, S): out[b, t, k] = video[b, t+k-kt//2]
    with zero padding at the temporal edges."""
    B, T, S, _ = video.shape
    if interpret is None:
        interpret = not available()
    pad = kt // 2

    def kernel(x_ref, o_ref):
        x = x_ref[0]                                    # (T, S, S)
        z = jnp.zeros((pad, S, S), x.dtype)
        xp = jnp.concatenate([z, x, z], axis=0)         # (T + kt - 1, S, S)
        for k in range(kt):
            o_ref[0, :, k] = xp[k:k + T]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, kt, S, S), video.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, S, S), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, T, kt, S, S), lambda b: (b, 0, 0, 0, 0)),
        interpret=interpret,
    )(video)


def stack_frames_u8(clips_u8: jnp.ndarray, crop: int, dtype=jnp.bfloat16,
                    kt: int = 5,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused eval ingest + temporal stack: (B, T, H, W) uint8 raw frames ->
    (B, T, kt, crop, crop) normalized ``dtype``, center-cropped (the eval
    protocol -- reference test.py CenterCrop + ColorNormalize)."""
    B, T, H, W = clips_u8.shape
    if interpret is None:
        interpret = not available()
    pad = kt // 2
    c = int(round((H - crop) / 2.0))
    inv_std = 1.0 / (255.0 * STD)
    shift = MEAN / STD

    def kernel(x_ref, o_ref):
        x = x_ref[0].astype(jnp.float32)                # (T, H, W)
        xn = (x[:, c:c + crop, c:c + crop] * inv_std - shift).astype(
            o_ref.dtype)
        z = jnp.zeros((pad, crop, crop), o_ref.dtype)
        xp = jnp.concatenate([z, xn, z], axis=0)
        for k in range(kt):
            o_ref[0, :, k] = xp[k:k + T]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, kt, crop, crop), dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, H, W), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, T, kt, crop, crop),
                               lambda b: (b, 0, 0, 0, 0)),
        interpret=interpret,
    )(clips_u8)
