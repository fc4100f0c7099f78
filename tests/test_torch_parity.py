import os

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")


def test_torch_import_mapping_complete():
    """Every leaf of our SBL param tree must be filled by the importer
    (shape-correct), using a fabricated reference-named state dict."""
    import jax
    import jax.numpy as jnp
    import dataclasses
    from flax import traverse_util
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.utils.torch_import import (
        import_sbl_model)

    # build a real torch-free "state dict" by initializing our model and
    # reverse-engineering the names is circular; instead fabricate from the
    # reference naming scheme with correct shapes
    rng = np.random.RandomState(0)

    def lin(d_in, d_out, bias=True):
        out = {"weight": rng.randn(d_out, d_in).astype(np.float32)}
        if bias:
            out["bias"] = rng.randn(d_out).astype(np.float32)
        return out

    def bn(c):
        return {"weight": np.ones(c, np.float32),
                "bias": np.zeros(c, np.float32),
                "running_mean": np.zeros(c, np.float32),
                "running_var": np.ones(c, np.float32)}

    sd = {}

    def put(prefix, d):
        for k, v in d.items():
            sd[f"{prefix}.{k}"] = v

    sd["visual_frontend.frontend3D.0.weight"] = rng.randn(
        64, 1, 5, 7, 7).astype(np.float32)
    put("visual_frontend.frontend3D.1", bn(64))
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    for stage, (cin, cout) in enumerate(chans):
        for blk in range(2):
            t = f"visual_frontend.resnet18.layer{stage + 1}.{blk}"
            i = cin if blk == 0 else cout
            sd[f"{t}.conv1.weight"] = rng.randn(cout, i, 3, 3).astype(np.float32)
            sd[f"{t}.conv2.weight"] = rng.randn(cout, cout, 3, 3).astype(np.float32)
            put(f"{t}.bn1", bn(cout))
            put(f"{t}.bn2", bn(cout))
            if blk == 0 and cin != cout:
                sd[f"{t}.downsample.0.weight"] = rng.randn(
                    cout, cin, 1, 1).astype(np.float32)
                put(f"{t}.downsample.1", bn(cout))
    put("encoder.linear_in", lin(512, 512))
    sd["encoder.layer_norm_in.weight"] = np.ones(512, np.float32)
    sd["encoder.layer_norm_in.bias"] = np.zeros(512, np.float32)
    for i in range(6):
        t = f"encoder.layer_stack.{i}"
        for sub in ("w_qs", "w_ks", "w_vs", "fc"):
            put(f"{t}.slf_attn.{sub}", lin(512, 512))
        sd[f"{t}.slf_attn.layer_norm.weight"] = np.ones(512, np.float32)
        sd[f"{t}.slf_attn.layer_norm.bias"] = np.zeros(512, np.float32)
        put(f"{t}.pos_ffn.w_1", lin(512, 2048))
        put(f"{t}.pos_ffn.w_2", lin(2048, 512))
        sd[f"{t}.pos_ffn.layer_norm.weight"] = np.ones(512, np.float32)
        sd[f"{t}.pos_ffn.layer_norm.bias"] = np.zeros(512, np.float32)
    sd["decoder.tgt_word_emb.weight"] = rng.randn(58, 512).astype(np.float32)
    names = (["decoder.layer_first_l2r", "decoder.layer_first_r2l"]
             + [f"decoder.layer_stack_{d}.{i}" for i in range(5)
                for d in ("l2r", "r2l")])
    for t in names:
        for sub in ("w_qs", "w_ks", "w_vs", "fc"):
            put(f"{t}.slf_attn.{sub}", lin(512, 512))
            put(f"{t}.enc_attn.{sub}", lin(512, 512))
        for a in ("slf_attn", "enc_attn", "pos_ffn"):
            sd[f"{t}.{a}.layer_norm.weight"] = np.ones(512, np.float32)
            sd[f"{t}.{a}.layer_norm.bias"] = np.zeros(512, np.float32)
        put(f"{t}.pos_ffn.w_1", lin(512, 2048))
        put(f"{t}.pos_ffn.w_2", lin(2048, 512))
    sd["decoder.tgt_word_prj_l2r.weight"] = rng.randn(58, 512).astype(np.float32)
    sd["decoder.tgt_word_prj_r2l.weight"] = rng.randn(58, 512).astype(np.float32)

    params, batch_stats = import_sbl_model(sd)

    cfg = dataclasses.replace(C.sbl(), compute_dtype="float32")
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 30, 88, 88), jnp.float32)
    labels = jnp.zeros((1, 14), jnp.int32)
    ref_vars = jax.eval_shape(
        lambda: model.init({"params": key, "dropout": key, "teacher": key},
                           video, labels, labels, train=False))
    want = traverse_util.flatten_dict(ref_vars["params"])
    got = traverse_util.flatten_dict(params)
    missing = [k for k in want if k not in got]
    extra = [k for k in got if k not in want]
    assert not missing, f"importer missed params: {missing[:10]}"
    assert not extra, f"importer produced unknown params: {extra[:10]}"
    for k in want:
        assert tuple(np.shape(got[k])) == tuple(want[k].shape), (
            k, np.shape(got[k]), want[k].shape)
    want_bs = traverse_util.flatten_dict(ref_vars["batch_stats"])
    got_bs = traverse_util.flatten_dict(batch_stats)
    assert set(want_bs) == set(got_bs)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference repo not mounted")
@pytest.mark.slow
def test_full_numerical_parity_with_reference():
    """End-to-end agreement with the actual reference implementation:
    weights imported from the torch model, greedy bidirectional decode must
    produce identical token sequences (fusion_mode='reference_aliased')."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import parity_check
    report = parity_check.run(REFERENCE, batch=2, verbose=False)
    assert report["frontend_max_diff"] < 1e-2
    assert report["encoder_max_diff"] < 1e-2
    assert report["l2r_token_match"] == 1.0
    assert report["r2l_token_match"] == 1.0
    assert report["e2e_l2r_token_match"] > 0.95
    assert report["e2e_r2l_token_match"] > 0.95
