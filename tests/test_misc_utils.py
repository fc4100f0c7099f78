import json
import os

import numpy as np

from sbl_for_multilingual_lip_reading_tpu.data import (Batcher,
                                                       SyntheticLipDataset,
                                                       TwoStreamBatchSampler)
from sbl_for_multilingual_lip_reading_tpu.utils.profiler import StepTimer
from sbl_for_multilingual_lip_reading_tpu.data.manifest import (
    build_vocab_pickle)


def test_batcher_with_two_stream_sampler():
    """The classify workload's fixed-ratio bilingual batches
    (reference classify/train.py batch_sampler usage)."""
    ds = SyntheticLipDataset(size=20, frames=2, raw_size=8)
    lrw_idx = [i for i in range(20) if ds[i]["lang_id"] == 0]
    lrw1000_idx = [i for i in range(20) if ds[i]["lang_id"] == 1]
    sampler = TwoStreamBatchSampler(lrw_idx, lrw1000_idx, batch_size=4,
                                    secondary_batch_size=2, seed=0)
    batches = list(Batcher(ds, 4, sampler=sampler))
    assert len(batches) == len(sampler)
    for b in batches:
        assert (np.asarray(b["lang_id"]) == 0).sum() == 2
        assert (np.asarray(b["lang_id"]) == 1).sum() == 2


def test_step_timer():
    t = StepTimer(batch_size=10)
    for _ in range(3):
        with t.step():
            pass
    assert t.mean_step_time >= 0
    assert t.clips_per_sec > 0


def test_summary_writer_jsonl_fallback(tmp_path, monkeypatch):
    # force the JSONL path by making the tf import fail
    import builtins
    real_import = builtins.__import__

    def fake_import(name, *a, **k):
        if name == "tensorflow":
            raise ImportError("nope")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    from sbl_for_multilingual_lip_reading_tpu.utils.tensorboard import (
        SummaryWriter)
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 3)
    w.close()
    line = json.loads(open(os.path.join(tmp_path,
                                        "metrics.jsonl")).readline())
    assert line["tag"] == "loss" and line["value"] == 1.5 and line["step"] == 3


def test_build_vocab_pickle(tmp_path):
    out = tmp_path / "vocab.json"
    data = build_vocab_pickle(["abc", "abd"], str(out))
    assert data["VOCAB"]["<sos>"] == 0 and data["VOCAB"]["<eos>"] == 1
    assert set("abcd") <= set(data["VOCAB"])
    assert json.load(open(out))["VOCAB"]["a"] == data["VOCAB"]["a"]


def test_batcher_multihost_stripes():
    """Two simulated hosts must see disjoint stripes of the same global
    batches (same seed => same shuffled order)."""
    ds = SyntheticLipDataset(size=16, frames=2, raw_size=8)
    b0 = Batcher(ds, 8, shuffle=True, seed=3, process_index=0,
                 process_count=2)
    b1 = Batcher(ds, 8, shuffle=True, seed=3, process_index=1,
                 process_count=2)
    for x0, x1 in zip(b0, b1):
        assert x0["clip_u8"].shape[0] == 4
        assert x1["clip_u8"].shape[0] == 4
        # disjoint samples
        ids0 = {bytes(c) for c in x0["clip_u8"].reshape(4, -1)}
        ids1 = {bytes(c) for c in x1["clip_u8"].reshape(4, -1)}
        assert not (ids0 & ids1)


def test_hypotheses_helpers(tmp_path):
    from sbl_for_multilingual_lip_reading_tpu.utils.hypotheses import (
        process_dict, parse_hypothesis, add_results_to_json,
        beam_outputs_to_hyps)
    d = tmp_path / "dict.txt"
    d.write_bytes(b"<sos> 0\n<eos> 1\na 2\nb 3\n<space> 4\n")
    chars, sos, eos = process_dict(str(d))
    assert (sos, eos) == (0, 1) and chars[2] == "a"
    hyp = {"yseq": [0, 2, 4, 3, 1], "score": -1.5}
    text, token, tokenid, score = parse_hypothesis(hyp, chars)
    assert text == "a b<eos>".replace("<eos>", "<eos>")  # joined tokens
    assert tokenid == "2 4 3 1" and score == -1.5
    js = {"utt2spk": "spk1", "output": [{"name": "utt1", "text": "ab"}]}
    out = add_results_to_json(js, [hyp], chars)
    assert out["output"][0]["name"] == "utt1[1]"
    assert out["output"][0]["rec_tokenid"] == "2 4 3 1"
    hyps = beam_outputs_to_hyps(np.zeros((2, 3, 5), np.int32),
                                np.zeros((2, 3), np.float32))
    assert len(hyps) == 2 and len(hyps[0]) == 3


def test_random_drop_transform():
    from sbl_for_multilingual_lip_reading_tpu.data.transforms import (
        random_drop)
    rng = np.random.default_rng(0)
    clip = np.arange(30, dtype=np.float32)[:, None, None] * np.ones((1, 2, 2))
    out = random_drop(clip, rng, p=0.3)
    assert out.shape == clip.shape
    vals = out[:, 0, 0]
    # kept frames stay ordered; tail repeats the last kept frame
    kept = vals[np.concatenate([[True], np.diff(vals) > 0])]
    assert np.all(np.diff(kept) > 0)
    assert vals[-1] == kept[-1]


def test_mfcc_shape():
    from sbl_for_multilingual_lip_reading_tpu.data.audio import extract_mfcc
    sr = 16000
    y = np.sin(2 * np.pi * 400 * np.arange(sr) / sr).astype(np.float32)
    feat = extract_mfcc(y, sr=sr, n_mfcc=13, trim=False)
    assert feat.shape[1] == 13
    assert 90 <= feat.shape[0] <= 110
    assert np.isfinite(feat).all()


def test_trainer_nan_guard():
    import dataclasses
    import pytest
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer
    cfg = C.tiny_test("sbl")
    ds = SyntheticLipDataset(size=2, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds)
    tr.train_step = lambda s, b, r: (s, {"loss": np.float32("nan")})
    with pytest.raises(FloatingPointError):
        tr.train_epoch(0, max_steps=1)


def test_compile_cache_helper(tmp_path):
    import jax
    from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache import (
        enable_compile_cache)
    # disabling strings resolve to None and leave config untouched
    assert enable_compile_cache("none") is None
    assert enable_compile_cache("off") is None
    d = str(tmp_path / "xla_cache")
    assert enable_compile_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d
    import os
    assert os.path.isdir(d)


def test_compile_cache_cli_flag(tmp_path, monkeypatch):
    from sbl_for_multilingual_lip_reading_tpu.cli import build_argparser
    args = build_argparser().parse_args(
        ["--compile-cache", "none", "--cpu"])
    assert args.compile_cache == "none"
    # default resolves via SBL_COMPILE_CACHE
    monkeypatch.setenv("SBL_COMPILE_CACHE", str(tmp_path / "envcache"))
    from sbl_for_multilingual_lip_reading_tpu.utils.compile_cache import (
        enable_compile_cache)
    assert enable_compile_cache(None) == str(tmp_path / "envcache")
