"""Device mesh + sharding layer (replaces nn.DataParallel).

The reference's only parallelism is single-process ``nn.DataParallel``
replica scatter/gather over up to 8 GPUs (SBL train.py:115).  The TPU-native
equivalent is a ('data', 'model') mesh:

* **data axis**: batches shard over 'data'; GSPMD inserts the gradient
  all-reduce over ICI (the psum the reference gets implicitly from
  DataParallel's gather).
* **model axis** (tensor parallelism): attention QKV / output projections and
  FFN inner matrices shard over 'model' following the Megatron pattern
  (column-parallel in, row-parallel out) so each pair needs a single
  all-reduce, inserted by XLA from the sharding annotations alone.

BatchNorm note: under jit/GSPMD the frontend's BN reduces over the *global*
batch (= synced BN).  The reference's DataParallel computes per-replica
statistics; ``MeshConfig.sync_batchnorm=False`` reproduces those semantics
via ``models.frontend.GroupedBatchNorm`` (one stats group per dp shard,
computed inside the jitted graph with no collectives; running stats follow
torch's source replica).
"""
from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_mesh = mesh_utils.create_device_mesh((data, model),
                                             devices=devices[:n])
    return Mesh(dev_mesh, ("data", "model"))


# (path regex, PartitionSpec) -- first match wins.  Megatron-style TP for
# the transformer matmuls; everything else (convs, LN, BN, embeddings,
# vocab heads -- vocab 58 doesn't tile) replicated.  Specs are aligned to
# the TRAILING dims of the param: the SBL decoder's direction-vmapped
# params carry a leading (2, ...) axis that stays replicated.
PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(w_qs|w_ks|w_vs)/kernel$", P(None, "model")),            # column
    (r".*(slf_attn|enc_attn|slf|cross)/fc/kernel$", P("model", None)),
    (r".*(pos_ffn|ffn)/w_1/kernel$", P(None, "model")),
    (r".*(pos_ffn|ffn)/w_2/kernel$", P("model", None)),
)


def param_spec(path: str, shape, mesh: Mesh) -> P:
    """PartitionSpec for a parameter path, falling back to replication when
    the annotated dim doesn't divide by the mesh axis."""
    msize = mesh.shape["model"]
    for pattern, spec in PARAM_RULES:
        if re.match(pattern, path):
            if len(shape) < len(spec) or msize <= 1:
                return P()
            # right-align the rule onto the param's trailing dims
            offset = len(shape) - len(spec)
            full = P(*([None] * offset + list(spec)))
            for dim, axis in enumerate(full):
                if axis == "model" and shape[dim] % msize != 0:
                    return P()
            return full
    return P()


def shard_params(tree, mesh: Mesh):
    """Place a param/batch-stat pytree on the mesh per PARAM_RULES."""
    from flax import traverse_util
    flat = traverse_util.flatten_dict(tree)
    out = {}
    for k, v in flat.items():
        path = "/".join(map(str, k))
        spec = param_spec(path, np.shape(v), mesh)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)


def shard_opt_state(opt_state, mesh: Mesh, params):
    """Place optimizer-state leaves on the mesh.

    Param-shaped moment trees (adam's mu/nu mirror the param tree exactly)
    inherit their parameter's sharding -- matched by the trailing dict-key
    path -- and everything else (step counters, scalars) replicates.
    Needed after a checkpoint restore: orbax commits restored arrays to a
    single device, and a jitted step refuses mixed device sets."""
    from jax.tree_util import (DictKey, tree_flatten_with_path,
                               tree_unflatten)
    param_shard = {}
    for path, leaf in tree_flatten_with_path(params)[0]:
        key = tuple(k.key for k in path if isinstance(k, DictKey))
        sh = getattr(leaf, "sharding", None)
        if key and sh is not None:
            param_shard[key] = sh
    leaves, treedef = tree_flatten_with_path(opt_state)
    rep = replicated_sharding(mesh)
    out = []
    for path, leaf in leaves:
        dict_keys = tuple(k.key for k in path if isinstance(k, DictKey))
        sh = None
        for start in range(len(dict_keys)):
            sh = param_shard.get(dict_keys[start:])
            if sh is not None:
                break
        out.append(jax.device_put(leaf, sh if sh is not None else rep))
    return tree_unflatten(treedef, out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard every array in a batch dict along its leading (batch) dim."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
