"""Empirical probe: which reshape/transpose/concat patterns Mosaic accepts.

Drives the fused decoder-layer kernel design (ops/decoder_layer.py): the
first version died on `(80,512) -> (16,5,8,64)` ("infer-vector-layout:
unsupported shape cast"), so map the legal moves before restructuring.
"""
from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def try_case(name, shapes, body):
    """shapes: list of input shapes; body(*vals) -> out array."""
    def kernel(*refs):
        *ins, o = refs
        out = body(*[r[...] for r in ins])
        o[...] = out

    args = [jnp.asarray(np.random.default_rng(0).standard_normal(s),
                        jnp.bfloat16) for s in shapes]
    out_shape = jax.eval_shape(body, *args)
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype))
        jax.block_until_ready(jax.jit(fn)(*args))
        print(f"OK    {name}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}", flush=True)
        return False


R, D, H, d = 272, 512, 8, 64  # Bt=16, L=17

cases = [
    ("minor split (272,512)->(272,8,64)", [(R, D)],
     lambda x: x.reshape(R, H, d)),
    ("row split unaligned (272,512)->(16,17,512)", [(R, D)],
     lambda x: x.reshape(16, 17, D)),
    ("row split aligned (128,512)->(16,8,512)", [(128, D)],
     lambda x: x.reshape(16, 8, D)),
    ("row split aligned (384,512)->(16,24,512)", [(384, D)],
     lambda x: x.reshape(16, 24, D)),
    ("collapse (16,24,512)->(384,512)", [(16, 24, D)],
     lambda x: x.reshape(384, D)),
    ("collapse unaligned (16,17,512)->(272,512)", [(16, 17, D)],
     lambda x: x.reshape(R, D)),
    ("minor concat 2x(272,64)->(272,128)", [(R, d), (R, d)],
     lambda a, b: jnp.concatenate([a, b], axis=1)),
    ("minor concat 8x(272,64)->(272,512)", [(R, d)] * 8,
     lambda *xs: jnp.concatenate(xs, axis=1)),
    ("minor slice (272,512)[:,64:128]", [(R, D)],
     lambda x: x[:, 64:128]),
    ("4d transpose (16,24,8,64)->(16,8,24,64)", [(16, 24, H, d)],
     lambda x: jnp.transpose(x, (0, 2, 1, 3))),
    ("4d collapse (16,8,24,64)->(128,24,64)", [(16, H, 24, d)],
     lambda x: x.reshape(128, 24, d)),
    ("3d leading split (128,24,64)->(16,8,24,64)", [(128, 24, d)],
     lambda x: x.reshape(16, H, 24, d)),
    ("3d x 2d dot (16,24,512)x(512,512)", [(16, 24, D), (D, D)],
     lambda x, w: jax.lax.dot_general(
         x, w, (((2,), (0,)), ((), ())),
         preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
    ("minor split aligned rows (256,512)->(256,8,64)", [(256, D)],
     lambda x: x.reshape(256, H, d)),
    ("2d->3d leading (272,512)->(1,272,512)", [(R, D)],
     lambda x: x.reshape(1, R, D)),
    ("3d minor merge (272,8,64)->(272,512)", [(R, H, d)],
     lambda x: x.reshape(R, D)),
    ("3d batched dot bcast rhs (8,272,512)x(8,512,64)",
     [(H, R, D), (H, D, d)],
     lambda x, w: jax.lax.dot_general(
         x, w, (((2,), (1,)), ((0,), (0,))),
         preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
    ("bcast (272,512)->(8,272,512)", [(R, D)],
     lambda x: jnp.broadcast_to(x[None], (H, R, D))),
    ("stack axis1 8x(16,17,64)->(16,8,17,64)", [(16, 17, d)] * 8,
     lambda *xs: jnp.stack(xs, axis=1)),
    ("stack axis0 8x(16,17,64)->(8,16,17,64)", [(16, 17, d)] * 8,
     lambda *xs: jnp.stack(xs, axis=0)),
    ("leading concat 8x(16,17,64)->(128,17,64)", [(16, 17, d)] * 8,
     lambda *xs: jnp.concatenate(xs, axis=0)),
    ("transpose (2,0,1,3) on (16,17,8,64)", [(16, 17, H, d)],
     lambda x: jnp.transpose(x, (2, 0, 1, 3))),
    ("row index 1d (13,512)[3] -> (1,512)", [(13, D)],
     lambda x: x[3][None]),
    ("row slice 2d (13,512)[3:4]", [(13, D)],
     lambda x: x[3:4]),
    ("squeeze mid (16,8,17,64)[:,3]->(16,17,64)", [(16, H, 17, d)],
     lambda x: x[:, 3]),
    ("expand mid (16,17,64)[:,None]", [(16, 17, d)],
     lambda x: x[:, None]),
    ("4d collapse unaligned (16,8,17,64)->(128,17,64)", [(16, H, 17, d)],
     lambda x: x.reshape(128, 17, d)),
    ("3d leading split unaligned (128,17,64)->(16,8,17,64)", [(128, 17, d)],
     lambda x: x.reshape(16, H, 17, d)),
]

if __name__ == "__main__":
    for name, shapes, body in cases:
        try_case(name, shapes, body)
