"""Empirical probe: which integer->float cast paths Mosaic accepts on TPU.

Round-3 finding: the training-ingest kernel (ops/ingest.py) compiles in
interpret mode but dies on the chip with "Unsupported cast: uint8 ->
float32".  Map the legal conversion routes before restructuring.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def try_case(name, in_dtype, body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (8, 256)), in_dtype)
    out_shape = jax.eval_shape(body, x)
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype))
        r = jax.block_until_ready(jax.jit(fn)(x))
        ref = np.asarray(body(x))
        ok = np.allclose(np.asarray(r, np.float32), ref.astype(np.float32),
                         atol=1e-2)
        print(f"{'OK  ' if ok else 'WRONG'} {name}", flush=True)
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"FAIL  {name}: {msg}", flush=True)
        return False


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    try_case("u8 -> f32 direct", jnp.uint8, lambda x: x.astype(jnp.float32))
    try_case("u8 -> i32 -> f32", jnp.uint8,
             lambda x: x.astype(jnp.int32).astype(jnp.float32))
    try_case("u8 -> u32 -> f32", jnp.uint8,
             lambda x: x.astype(jnp.uint32).astype(jnp.float32))
    try_case("u8 -> i16 -> i32 -> f32", jnp.uint8,
             lambda x: x.astype(jnp.int16).astype(jnp.int32)
             .astype(jnp.float32))
    try_case("u8 -> i32", jnp.uint8, lambda x: x.astype(jnp.int32))
    try_case("i8 -> i32 -> f32", jnp.int8,
             lambda x: x.astype(jnp.int32).astype(jnp.float32))
    try_case("u8 -> bf16", jnp.uint8, lambda x: x.astype(jnp.bfloat16))
    try_case("i32 -> f32", jnp.int32, lambda x: x.astype(jnp.float32))
    try_case("u8 bitwise+i32", jnp.uint8,
             lambda x: (x.astype(jnp.int32) & 0xFF).astype(jnp.float32))
