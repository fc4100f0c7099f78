"""Import reference PyTorch checkpoints into this framework's param trees.

The reference ships/loads torch ``state_dict`` checkpoints (frontend ``.pt``
files like ``acc0.84412.pt``, full ``BEST_checkpoint_*.tar`` pickles --
reference video_frontend.py:176-190, train.py:91-103).  This module maps a
state dict (as ``{name: np.ndarray}`` -- no torch dependency here; use
``tools/parity_check.py`` or ``load_torch_file`` to extract one) onto our
``{params, batch_stats}`` trees so users of the reference can carry their
trained weights across.

Layout conversions:
* torch ``nn.Linear`` weight (out, in)  -> flax kernel (in, out)  [transpose]
* torch ``Conv2d`` (out, in, kh, kw)    -> flax (kh, kw, in, out)
* torch ``Conv3d`` (out, in, kt, kh, kw)-> flax (kt, kh, kw, in, out)
* BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
* SBL decoder: the reference's separate l2r/r2l stacks interleave into our
  direction-vmapped params (leading axis 2, dir 0 = l2r); its per-layer
  ``enc_attn.w_ks/w_vs`` become the hoisted ``cross_kv_i`` projections.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def _lin(sd, name):
    """Linear weight+optional bias -> (kernel, bias|None)."""
    w = np.asarray(sd[name + ".weight"]).T
    b = sd.get(name + ".bias")
    return w, (np.asarray(b) if b is not None else None)


def _set_dense(tree, path, sd, name):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    k, b = _lin(sd, name)
    node[path[-1]] = {"kernel": k} if b is None else {"kernel": k, "bias": b}


def _set_bn(params, stats, path, sd, name):
    p = params
    s = stats
    for q in path[:-1]:
        p = p.setdefault(q, {})
        s = s.setdefault(q, {})
    p[path[-1]] = {"scale": np.asarray(sd[name + ".weight"]),
                   "bias": np.asarray(sd[name + ".bias"])}
    s[path[-1]] = {"mean": np.asarray(sd[name + ".running_mean"]),
                   "var": np.asarray(sd[name + ".running_var"])}


def _set_conv2d(params, path, sd, name):
    node = params
    for q in path[:-1]:
        node = node.setdefault(q, {})
    w = np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0)
    node[path[-1]] = {"kernel": w}


def _mha(params, prefix_path, sd, torch_prefix):
    """Full MHA (w_qs/w_ks/w_vs/fc + layer_norm) under prefix_path."""
    for sub in ("w_qs", "w_ks", "w_vs", "fc"):
        _set_dense(params, prefix_path + [sub], sd, f"{torch_prefix}.{sub}")
    node = params
    for q in prefix_path:
        node = node.setdefault(q, {})
    node["layer_norm"] = {
        "scale": np.asarray(sd[f"{torch_prefix}.layer_norm.weight"]),
        "bias": np.asarray(sd[f"{torch_prefix}.layer_norm.bias"])}


def _ffn(params, prefix_path, sd, torch_prefix):
    for sub in ("w_1", "w_2"):
        _set_dense(params, prefix_path + [sub], sd, f"{torch_prefix}.{sub}")
    node = params
    for q in prefix_path:
        node = node.setdefault(q, {})
    node["layer_norm"] = {
        "scale": np.asarray(sd[f"{torch_prefix}.layer_norm.weight"]),
        "bias": np.asarray(sd[f"{torch_prefix}.layer_norm.bias"])}


def _dual(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.stack([a, b])


def _dual_dense(sd, l2r, r2l):
    wl, bl = _lin(sd, l2r)
    wr, br = _lin(sd, r2l)
    out = {"kernel": _dual(wl, wr)}
    if bl is not None:
        out["bias"] = _dual(bl, br)
    return out


def _dual_ln(sd, l2r, r2l):
    return {"scale": _dual(np.asarray(sd[l2r + ".weight"]),
                           np.asarray(sd[r2l + ".weight"])),
            "bias": _dual(np.asarray(sd[l2r + ".bias"]),
                          np.asarray(sd[r2l + ".bias"]))}


def import_frontend(sd: Dict[str, np.ndarray], resnet_blocks=(2, 2, 2, 2),
                    prefix: str = "visual_frontend.") -> Tuple[Dict, Dict]:
    """Reference visual_frontend state dict -> (params, batch_stats)."""
    P: Dict = {}
    S: Dict = {}
    w = np.asarray(sd[prefix + "frontend3D.0.weight"]).transpose(2, 3, 4, 1, 0)
    P["conv3d_kernel"] = w
    _set_bn(P, S, ["bn3d"], sd, prefix + "frontend3D.1")
    P["resnet"] = {}
    S["resnet"] = {}
    for stage, nblocks in enumerate(resnet_blocks):
        for blk in range(nblocks):
            t = f"{prefix}resnet18.layer{stage + 1}.{blk}"
            o = f"layer{stage + 1}_block{blk}"
            _set_conv2d(P["resnet"], [o, "conv1"], sd, t + ".conv1")
            _set_conv2d(P["resnet"], [o, "conv2"], sd, t + ".conv2")
            _set_bn(P["resnet"], S["resnet"], [o, "bn1"], sd, t + ".bn1")
            _set_bn(P["resnet"], S["resnet"], [o, "bn2"], sd, t + ".bn2")
            if t + ".downsample.0.weight" in sd:
                _set_conv2d(P["resnet"], [o, "downsample_conv"], sd,
                            t + ".downsample.0")
                _set_bn(P["resnet"], S["resnet"], [o, "downsample_bn"], sd,
                        t + ".downsample.1")
    return P, S


def import_encoder(sd: Dict[str, np.ndarray], n_layers: int = 6,
                   prefix: str = "encoder.") -> Dict:
    P: Dict = {}
    _set_dense(P, ["linear_in"], sd, prefix + "linear_in")
    P["layer_norm_in"] = {
        "scale": np.asarray(sd[prefix + "layer_norm_in.weight"]),
        "bias": np.asarray(sd[prefix + "layer_norm_in.bias"])}
    for i in range(n_layers):
        t = f"{prefix}layer_stack.{i}"
        _mha(P, [f"layer_{i}", "slf_attn"], sd, t + ".slf_attn")
        _ffn(P, [f"layer_{i}", "pos_ffn"], sd, t + ".pos_ffn")
    return P


def import_sbl_decoder(sd: Dict[str, np.ndarray], n_layers: int = 6,
                       prefix: str = "decoder.") -> Dict:
    """Reference SBL decoder -> our direction-vmapped layout."""
    P: Dict = {"step": {}, }
    step = P["step"]
    step["tgt_word_emb"] = {
        "embedding": np.asarray(sd[prefix + "tgt_word_emb.weight"])}

    def torch_layer_names(i):
        if i == 0:
            return prefix + "layer_first_l2r", prefix + "layer_first_r2l"
        return (f"{prefix}layer_stack_l2r.{i - 1}",
                f"{prefix}layer_stack_r2l.{i - 1}")

    for i in range(n_layers):
        l2r, r2l = torch_layer_names(i)
        layer: Dict = {}
        # self-attention (dual)
        slf: Dict = {}
        for sub in ("w_qs", "w_ks", "w_vs", "fc"):
            slf[sub] = _dual_dense(sd, f"{l2r}.slf_attn.{sub}",
                                   f"{r2l}.slf_attn.{sub}")
        slf["layer_norm"] = _dual_ln(sd, f"{l2r}.slf_attn.layer_norm",
                                     f"{r2l}.slf_attn.layer_norm")
        layer["slf"] = slf
        # cross-attention: q/out/LN live in the step; k/v are hoisted
        cross: Dict = {}
        for sub in ("w_qs", "fc"):
            cross[sub] = _dual_dense(sd, f"{l2r}.enc_attn.{sub}",
                                     f"{r2l}.enc_attn.{sub}")
        cross["layer_norm"] = _dual_ln(sd, f"{l2r}.enc_attn.layer_norm",
                                       f"{r2l}.enc_attn.layer_norm")
        layer["cross"] = cross
        # FFN (dual)
        ffn: Dict = {}
        for sub in ("w_1", "w_2"):
            ffn[sub] = _dual_dense(sd, f"{l2r}.pos_ffn.{sub}",
                                   f"{r2l}.pos_ffn.{sub}")
        ffn["layer_norm"] = _dual_ln(sd, f"{l2r}.pos_ffn.layer_norm",
                                     f"{r2l}.pos_ffn.layer_norm")
        layer["ffn"] = ffn
        step[f"layer_{i}"] = layer
        # hoisted cross K/V projections
        P[f"cross_kv_{i}"] = {
            "w_ks": _dual_dense(sd, f"{l2r}.enc_attn.w_ks",
                                f"{r2l}.enc_attn.w_ks"),
            "w_vs": _dual_dense(sd, f"{l2r}.enc_attn.w_vs",
                                f"{r2l}.enc_attn.w_vs"),
        }
    # untied output heads (no bias in the reference, decoder.py:59-60)
    wl = np.asarray(sd[prefix + "tgt_word_prj_l2r.weight"]).T
    wr = np.asarray(sd[prefix + "tgt_word_prj_r2l.weight"]).T
    step["tgt_word_prj"] = {"kernel": _dual(wl, wr)}
    return P


def import_sbl_model(sd: Dict[str, np.ndarray], n_enc_layers: int = 6,
                     n_dec_layers: int = 6,
                     resnet_blocks=(2, 2, 2, 2)) -> Tuple[Dict, Dict]:
    """Full reference SBL Transformer state dict -> (params, batch_stats)."""
    fe_p, fe_s = import_frontend(sd, resnet_blocks)
    params = {
        "frontend": fe_p,
        "encoder": import_encoder(sd, n_enc_layers),
        "decoder": import_sbl_decoder(sd, n_dec_layers),
    }
    batch_stats = {"frontend": fe_s}
    return params, batch_stats


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Extract a {name: np.ndarray} state dict from a torch .pt/.tar file
    (requires torch; handles both raw state dicts and the reference's
    whole-model 'checkpoint.tar' pickles)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:     # checkpoint.tar
        model = obj["model"]
        sd = (model.module.state_dict()
              if hasattr(model, "module") else model.state_dict())
    elif isinstance(obj, dict):                      # raw state dict
        sd = obj
    else:                                            # pickled nn.Module
        sd = obj.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
