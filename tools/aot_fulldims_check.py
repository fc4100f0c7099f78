"""AOT lower+compile the FULL-dims sharded train/eval steps on a virtual
CPU mesh -- no execution, no full-dims buffers.

Validates that the production dp=8 (and dp=4 x tp=2) B=240-global SBL
graphs at full reference dims (d_model 512, 6+6 layers, 30x88x88 clips --
reference SBL_Multilingual_Lip_reading/train.py:115's 8-way DataParallel
recipe) partition, lower, and compile, and reports XLA's per-chip memory
estimate, catching the remat-off HBM-overflow class (the B=264 worker
crash, CLAUDE.md round 3) without touching real hardware.

Shared by __graft_entry__.dryrun_multichip (the driver contract) and the
standalone CLI: python tools/aot_fulldims_check.py [dp] [tp]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aot_fulldims_check(mesh, global_batch: int = 240,
                       remat_frontend: bool = None,
                       eval_too: bool = True, train_too: bool = True,
                       verbose: bool = True) -> dict:
    """AOT-compile the full-dims train (+ eval) step over ``mesh``.

    Returns {"train_compile_s", "eval_compile_s", "train_temp_bytes",
    "eval_temp_bytes", "argument_bytes"}; raises on any compile failure.
    Memory numbers are XLA's buffer-assignment estimates for ONE shard
    (per-chip), or -1 when the backend doesn't expose them.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import traverse_util
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.parallel.mesh import param_spec
    from sbl_for_multilingual_lip_reading_tpu.training.schedule import (
        make_optimizer)
    from sbl_for_multilingual_lip_reading_tpu.training.steps import (
        make_sbl_eval_step, make_sbl_train_step)
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        init_state)

    cfg = C.sbl()
    if remat_frontend is not None:
        cfg = dataclasses.replace(cfg, remat_frontend=remat_frontend)
    model = build_model(cfg)
    tx = make_optimizer(cfg.optim)
    rng = jax.random.PRNGKey(0)

    # abstract state: shapes/dtypes only, nothing materialized
    state_abs = jax.eval_shape(lambda r: init_state(model, cfg, r)[0], rng)

    rep = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))

    def shard_tree_abs(tree):
        """param_spec-ruled shardings onto an abstract param/stat tree."""
        flat = traverse_util.flatten_dict(tree)
        out = {}
        for k, v in flat.items():
            path = "/".join(map(str, k))
            spec = param_spec(path, v.shape, mesh)
            out[k] = jax.ShapeDtypeStruct(v.shape, v.dtype,
                                          sharding=NamedSharding(mesh, spec))
        return traverse_util.unflatten_dict(out)

    params_abs = shard_tree_abs(state_abs.params)
    param_sh = {k: v.sharding
                for k, v in traverse_util.flatten_dict(params_abs).items()}

    def opt_leaf(path_keys, leaf):
        # adam moments mirror the param tree; match by trailing dict path
        for start in range(len(path_keys)):
            sh = param_sh.get(path_keys[start:])
            if sh is not None:
                return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                            sharding=sh)
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=rep)

    from jax.tree_util import DictKey, tree_flatten_with_path, tree_unflatten
    leaves, treedef = tree_flatten_with_path(state_abs.opt_state)
    opt_abs = tree_unflatten(treedef, [
        opt_leaf(tuple(k.key for k in path if isinstance(k, DictKey)), leaf)
        for path, leaf in leaves])

    def rep_tree(tree):
        return jax.tree_util.tree_map(
            lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=rep),
            tree)

    state_in = state_abs.replace(
        params=params_abs,
        batch_stats=shard_tree_abs(state_abs.batch_stats),
        opt_state=opt_abs,
        step=jax.ShapeDtypeStruct(state_abs.step.shape, state_abs.step.dtype,
                                  sharding=rep))

    B, T = global_batch, cfg.data.frames
    raw, pad = cfg.data.raw_size, cfg.decoder.target_pad_len

    def dstruct(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=dsh)

    batch_abs = {
        "clip_u8": dstruct((B, T, raw, raw), jnp.uint8),
        "labels": dstruct((B, pad), jnp.int32),
        "labels_reverse": dstruct((B, pad), jnp.int32),
        "offsets": dstruct((B, T, 2), jnp.int32),
        "flip": dstruct((B,), jnp.bool_),
        "frame_map": dstruct((B, T), jnp.int32),
    }
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=rep)

    def mem_of(compiled):
        try:
            ma = compiled.memory_analysis()
            return int(getattr(ma, "temp_size_in_bytes", -1)), \
                int(getattr(ma, "argument_size_in_bytes", -1))
        except Exception:
            return -1, -1

    out = {}
    with mesh:
        if train_too:
            t0 = time.perf_counter()
            train_step = make_sbl_train_step(model, tx, cfg, donate=True)
            lowered = train_step.lower(state_in, batch_abs, rng_abs)
            compiled = lowered.compile()
            out["train_compile_s"] = round(time.perf_counter() - t0, 1)
            out["train_temp_bytes"], out["argument_bytes"] = mem_of(compiled)
        if eval_too:
            t0 = time.perf_counter()
            eval_step = make_sbl_eval_step(model, cfg)
            ebatch = {"clip_u8": batch_abs["clip_u8"]}
            ecompiled = jax.jit(eval_step).lower(state_in, ebatch).compile()
            out["eval_compile_s"] = round(time.perf_counter() - t0, 1)
            out["eval_temp_bytes"], _ = mem_of(ecompiled)
    if verbose:
        gb = 1 << 30
        parts = [f"  full-dims AOT mesh={dict(mesh.shape)} B={B}:"]
        if train_too:
            parts.append(f"train compile {out['train_compile_s']}s "
                         f"temp {out['train_temp_bytes'] / gb:.2f} GiB, "
                         f"args {out['argument_bytes'] / gb:.2f} GiB")
        if eval_too:
            parts.append(f"eval compile {out['eval_compile_s']}s "
                         f"temp {out['eval_temp_bytes'] / gb:.2f} GiB")
        print(" ".join(parts), flush=True)
    return out


def main():
    """CLI: python tools/aot_fulldims_check.py [dp] [tp] [job]

    job: ``both`` (default, train+eval), ``train``, or ``eval``.  Prints a
    final machine-readable line ``AOT_JSON {...}`` so the driver-facing
    ``__graft_entry__.dryrun_multichip`` can run each compile as a
    deadline-bounded subprocess (round-4 lesson: the unconditional in-process
    4-compile sweep blew the driver's ~10-min budget, MULTICHIP_r04 rc=124).
    """
    import json

    n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_dev *= int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache import (
        enable_compile_cache)
    enable_compile_cache()
    from sbl_for_multilingual_lip_reading_tpu.parallel import make_mesh
    dp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tp = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    job = sys.argv[3] if len(sys.argv) > 3 else "both"
    mesh = make_mesh(data=dp, model=tp)
    out = aot_fulldims_check(mesh, eval_too=(job != "train"),
                             train_too=(job != "eval"))
    print("AOT_JSON " + json.dumps({"dp": dp, "tp": tp, "job": job, **out}),
          flush=True)


if __name__ == "__main__":
    main()
