"""Checkpoint save/restore with the reference's tolerant partial-load.

Replaces ``torch.save`` whole-object pickling (reference utils.py:22-33) with
orbax array checkpoints of {params, batch_stats, opt_state, step, meta}, and
reimplements the shape-filtered partial state-dict merge
(reference train.py:91-103 / video_frontend.py:179-188) that the three-stage
training recipe depends on: restore whatever intersects by path AND shape,
keep fresh init for the rest -- so a classify-stage encoder can seed the SBL
model across architecture drift.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


def save_checkpoint(path: str, state, epoch: int = 0,
                    best_metric: float = float("inf"),
                    is_best: bool = False) -> None:
    """Save to <path>/ (and mirror to <path>_best/ when is_best)."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"epoch": np.array(epoch, np.int32),
                 "best_metric": np.array(best_metric, np.float32)},
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    if is_best:
        ckptr.save(os.path.abspath(path) + "_best", payload, force=True)
        ckptr.wait_until_finished()


def restore_checkpoint(path: str, state, mesh=None) -> Tuple[Any, int, float]:
    """Full restore into an abstract-state template.  Returns
    (new_state, epoch, best_metric).

    mesh: when resuming onto a dp x tp mesh, re-places the restored tree on
    it (params/batch_stats per PARAM_RULES, optimizer moments inheriting
    their parameter's sharding, counters replicated) -- orbax commits
    restored arrays to one device, and a jitted step refuses inputs on
    mixed device sets."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": {"epoch": np.array(0, np.int32),
                 "best_metric": np.array(0, np.float32)},
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    params = restored["params"]
    batch_stats = restored["batch_stats"]
    opt_state = restored["opt_state"]
    step = restored["step"]
    if mesh is not None:
        from ..parallel import (replicated_sharding, shard_opt_state,
                                shard_params)
        params = shard_params(params, mesh)
        batch_stats = shard_params(batch_stats, mesh)
        opt_state = shard_opt_state(opt_state, mesh, params)
        step = jax.device_put(step, replicated_sharding(mesh))
    new_state = state.replace(params=params, batch_stats=batch_stats,
                              opt_state=opt_state, step=step)
    meta = restored["meta"]
    return new_state, int(meta["epoch"]), float(meta["best_metric"])


def partial_merge(fresh: Dict, pretrained: Dict,
                  verbose: bool = True) -> Tuple[Dict, list, list]:
    """Merge pretrained leaves into a fresh tree wherever path AND shape
    match (the reference's filtered state-dict update, train.py:96-103).
    Returns (merged, loaded_paths, missed_paths)."""
    flat_fresh = traverse_util.flatten_dict(fresh)
    flat_pre = traverse_util.flatten_dict(pretrained)
    loaded, missed = [], []
    out = {}
    for k, v in flat_fresh.items():
        pv = flat_pre.get(k)
        if pv is not None and getattr(pv, "shape", None) == getattr(v, "shape", None):
            out[k] = pv
            loaded.append("/".join(map(str, k)))
        else:
            out[k] = v
            missed.append("/".join(map(str, k)))
    if verbose:
        print(f"loaded params/tot params: {len(loaded)}/{len(flat_fresh)}")
        if missed:
            print(f"miss matched params: {missed[:20]}"
                  + (" ..." if len(missed) > 20 else ""))
    return traverse_util.unflatten_dict(out), loaded, missed


def restore_for_transfer(path: str, state, load_prefixes: Optional[list] = None):
    """Partial restore: pull params/batch_stats from an arbitrary checkpoint
    and merge the path+shape intersection into ``state`` (optimizer state is
    re-initialized by the caller -- matching the reference, which rebuilds
    the optimizer after a transfer load, train.py:106-109).

    load_prefixes: optional list of path prefixes to restrict the merge.
    Each prefix is a '/'-joined path whose segments must match the leading
    segments of a leaf path: "encoder" keeps the whole encoder subtree,
    "decoder/layer_0" just that layer.
    """
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    pre_params = restored.get("params", {})
    pre_bs = restored.get("batch_stats", {})
    if load_prefixes is not None:
        prefixes = [tuple(str(p).strip("/").split("/"))
                    for p in load_prefixes]

        def keep(tree):
            flat = traverse_util.flatten_dict(tree)
            kept = {k: v for k, v in flat.items()
                    if any(tuple(map(str, k[:len(p)])) == p
                           for p in prefixes)}
            return traverse_util.unflatten_dict(kept)

        pre_params = keep(pre_params)
        pre_bs = keep(pre_bs)
    merged_params, loaded, _ = partial_merge(state.params, pre_params)
    merged_bs, _, _ = partial_merge(state.batch_stats, pre_bs, verbose=False)
    return state.replace(params=merged_params, batch_stats=merged_bs), loaded
