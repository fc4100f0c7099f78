"""Fused Pallas ResNet BasicBlock kernel (eval path) -- MEASURED SLOWER
than XLA's conv emitter; kept default-OFF as a documented experiment.

Motivation: the trunk's stage-1 blocks (reference video_frontend.py:15-41,
64->64 channels at 22x22 spatial) run at ~24% MXU under XLA @B=256
(~5.9 ms per 274-GFLOP conv), and each conv round-trips a 476 MB
activation tensor through HBM.  This kernel computes a whole BasicBlock
-- conv1 + BN + ReLU + conv2 + BN + residual + ReLU -- in one pass per
batch tile, with each 3x3 stride-1 conv as ONE K=9C im2col dot and the
eval BatchNorm folded to a per-channel affine.

Round-3 on-chip results (tools/concat_probe.py, N=7680/S=22/C=64):

* the natural minor-dim tap concat does NOT compile: the shifted slices
  carry different sublane/lane offsets and ``tpu.concatenate`` requires
  matching offsets on non-concat dims ("result/input offset mismatch");
* building the patch tensor through a VMEM scratch (stores normalize
  layout) compiles and is exact, but runs 15.5 ms/conv; ``lax.pad``-built
  taps 13.0 ms -- both 2.2-2.6x SLOWER than XLA's 5.9 ms, because each
  of the 9 taps costs a Mosaic sublane+lane relayout (C=64 packs two W
  columns per 128-lane register, so a kx shift is not a pure sublane
  move) and the (22,22)->484 row fold relays the whole patch tensor;
* the dot itself is not the ceiling anyway: with C_out=64 one matmul dim
  always bills a half-empty 128 tile, capping ANY single-conv
  formulation near ~50% MXU (~2.9 ms) -- the realistic best case saves
  only ~7 ms of a 99.5 ms pipeline, and the relayout tax eats it.

Conclusion: XLA's lanes=N conv emitter wins for these shapes; the module
path stays the production eval path.  The kernel remains correct
(scratch-buffer im2col) for future Mosaic versions where concat/relayout
costs change.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .attention import available, _pick_tile, pltpu


def fold_bn(scale, bias, mean, var, epsilon: float) -> Tuple[jnp.ndarray,
                                                             jnp.ndarray]:
    """Eval BatchNorm y = (x - mean) * rsqrt(var + eps) * scale + bias as a
    per-channel affine y = x * a + b (all fp32)."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + epsilon) * \
        scale.astype(jnp.float32)
    return inv, bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv


def fused_resblock(x: jnp.ndarray, w1: jnp.ndarray, a1, b1,
                   w2: jnp.ndarray, a2, b2,
                   interpret: Optional[bool] = None,
                   tile: Optional[int] = None) -> jnp.ndarray:
    """x: (N, S, S, C); w1/w2: (3, 3, C, C) HWIO; a*/b*: (C,) fp32 folded
    BN affines.  Returns relu(bn2(conv2(relu(bn1(conv1(x))))) + x)."""
    N, S, S2, C = x.shape
    assert S == S2 and w1.shape == (3, 3, C, C) and w2.shape == (3, 3, C, C)
    if interpret is None:
        interpret = not available()
    if tile is None:
        # larger batch tiles for the small late-stage spatials so the dot's
        # M dim stays MXU-sized; bounded by the 9C-wide patch VMEM buffer
        tile = 8 if S >= 16 else (16 if S >= 8 else 32)
    Bt = _pick_tile(N, cap=tile)
    K = 9 * C
    # (3,3,C,C) HWIO row-major -> (9C, C): K index = (ky*3+kx)*C + cin,
    # matching the kernel's (ky, kx)-ordered channel concat
    w1m = w1.reshape(K, C).astype(x.dtype)
    w2m = w2.reshape(K, C).astype(x.dtype)
    aff = jnp.stack([a1, b1, a2, b2]).astype(jnp.float32)   # (4, C)

    def kernel(x_ref, w1_ref, w2_ref, aff_ref, o_ref, pat_ref):
        xv = x_ref[...]                                     # (Bt, S, S, C)

        def conv(v, w_ref):
            # tap writes go through a VMEM scratch: stores normalize the
            # shifted slices' sublane/lane offsets (a direct minor-dim
            # concat fails Mosaic's offset-matching, see module docstring)
            vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            for ky in range(3):
                for kx in range(3):
                    k = ky * 3 + kx
                    pat_ref[:, :, :, k * C:(k + 1) * C] = \
                        vp[:, ky:ky + S, kx:kx + S, :]
            out = jax.lax.dot_general(
                pat_ref[...].reshape(Bt * S * S, K), w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out.reshape(Bt, S, S, C)

        a1v, b1v = aff_ref[0], aff_ref[1]
        a2v, b2v = aff_ref[2], aff_ref[3]
        h = jnp.maximum(conv(xv, w1_ref) * a1v + b1v, 0.0)
        y = conv(h.astype(xv.dtype), w2_ref) * a2v + b2v \
            + xv.astype(jnp.float32)
        o_ref[...] = jnp.maximum(y, 0.0).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, S, S, C), x.dtype),
        grid=(N // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, S, S, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((K, C), lambda i: (0, 0)),
            pl.BlockSpec((K, C), lambda i: (0, 0)),
            pl.BlockSpec((4, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Bt, S, S, C), lambda i: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((Bt, S, S, K), x.dtype)],
        interpret=interpret,
    )(x, w1m, w2m, aff)
