import os

import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.data import (
    Batcher, SyntheticLipDataset, TwoStreamBatchSampler, make_ingest_fn,
    prefetch_to_device, transforms as T)
from sbl_for_multilingual_lip_reading_tpu.data.datasets import LrwDataset
from sbl_for_multilingual_lip_reading_tpu.data import manifest as MF
from sbl_for_multilingual_lip_reading_tpu.vocab import IGNORE_ID


def test_color_normalize_constants():
    x = np.array([0.413621], dtype=np.float64)
    assert abs(T.color_normalize(x)[0]) < 1e-9
    assert abs(T.color_normalize(np.array([1.0]))[0]
               - (1.0 - 0.413621) / 0.1700239) < 1e-9


def test_center_crop():
    clip = np.arange(2 * 96 * 96, dtype=np.float32).reshape(2, 96, 96)
    out = T.center_crop(clip, (88, 88))
    assert out.shape == (2, 88, 88)
    np.testing.assert_array_equal(out[0], clip[0, 4:92, 4:92])


def test_random_crop_per_frame_range():
    rng = np.random.default_rng(0)
    clip = np.random.rand(5, 96, 96).astype(np.float32)
    out = T.random_crop_per_frame(clip, (88, 88), rng)
    assert out.shape == (5, 88, 88)


def test_frame_removal_duplicates_previous():
    rng = np.random.default_rng(1)
    clip = np.arange(30, dtype=np.float32)[:, None, None] * np.ones((1, 4, 4))
    out = T.frame_removal(clip, rng, p=0.5)
    # frame 0 never replaced; replaced frames equal their predecessor
    assert out[0, 0, 0] == 0
    for i in range(1, 30):
        assert out[i, 0, 0] in (clip[i, 0, 0], out[i - 1, 0, 0])
    assert not np.array_equal(out, clip)  # p=0.5: virtually certain


def test_device_ingest_matches_host_plan():
    rng = np.random.default_rng(0)
    B, Tn, raw, crop = 3, 6, 32, 24
    clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
    plans = [T.make_train_plan(rng, Tn, raw, crop) for _ in range(B)]
    plans[1] = T.make_eval_plan(Tn, raw, crop)
    ingest = make_ingest_fn(crop)
    out = ingest(jnp.asarray(clips),
                 jnp.asarray(np.stack([p.offsets for p in plans])),
                 jnp.asarray(np.array([p.flip for p in plans])),
                 jnp.asarray(np.stack([p.frame_map for p in plans])))
    for b in range(B):
        expect = T.apply_plan_host(clips[b], plans[b], crop)
        np.testing.assert_allclose(np.asarray(out[b]), expect, atol=1e-5)


def test_synthetic_dataset_contract():
    ds = SyntheticLipDataset(size=8, frames=30, raw_size=96, pad_len=14)
    s = ds[0]
    assert s["clip_u8"].shape == (30, 96, 96) and s["clip_u8"].dtype == np.uint8
    assert s["labels"].shape == (14,)
    assert s["lang_id"] == 0 and ds[1]["lang_id"] == 1
    # reversed labels are the valid tokens reversed
    lab = s["labels"]
    valid = lab[lab != IGNORE_ID]
    rev = s["labels_reverse"]
    np.testing.assert_array_equal(rev[rev != IGNORE_ID], valid[::-1])
    # determinism
    np.testing.assert_array_equal(ds[3]["clip_u8"],
                                  SyntheticLipDataset(size=8)[3]["clip_u8"])


def test_batcher_shapes_and_drop_last():
    ds = SyntheticLipDataset(size=10, frames=4, raw_size=16, pad_len=14)
    batches = list(Batcher(ds, batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 2
    assert batches[0]["clip_u8"].shape == (4, 4, 16, 16)
    assert batches[0]["labels"].shape == (4, 14)


def test_prefetch_yields_all():
    ds = SyntheticLipDataset(size=8, frames=2, raw_size=8)
    batches = list(prefetch_to_device(Batcher(ds, 2, shuffle=False)))
    assert len(batches) == 4
    assert batches[0]["labels"].shape == (2, 14)


def test_two_stream_sampler():
    s = TwoStreamBatchSampler(list(range(10)), list(range(100, 104)),
                              batch_size=5, secondary_batch_size=2, seed=0)
    batches = list(s)
    assert len(batches) == len(s) == 3
    for b in batches:
        assert len(b) == 5
        assert sum(i >= 100 for i in b) == 2
        assert sum(i < 100 for i in b) == 3


def test_manifest_parsing_and_filters(tmp_path):
    lines = [
        "dir1,wav1,x,ni hao,0.0,0.4",
        "dir2,wav2,x,C,0.0,0.4",                   # bad label
        "dir3,7.31d3e1f43d431cecda814ff8ab3a4b437d,x,ma,0,0.2",  # corrupt id
        "dir4,wav4,x,zhong guo,1.0,1.48",
    ]
    p = tmp_path / "trn1.txt"
    p.write_text("\n".join(lines) + "\n")
    entries = MF.read_manifest(str(p))
    assert len(entries) == 2
    e = entries[0]
    assert e.pinyins == ["ni", "hao"]
    assert e.start_frame == 1 and e.end_frame == 11  # int(t*25)+1
    assert len(e.label_ids) >= 2
    e2 = entries[1]
    assert e2.start_frame == 26 and e2.end_frame == 38


def test_clean_manifest_silence_filter(tmp_path):
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    (wavdir / "wav1.wav").write_bytes(b"\x00" * 2000)
    (wavdir / "wav4.wav").write_bytes(b"\x00" * 10)   # "silent": header-only
    raw = tmp_path / "raw.txt"
    raw.write_text("dir1,wav1,x,ni hao,0.0,0.4\ndir4,wav4,x,ma,0.0,0.4\n")
    out = tmp_path / "clean.txt"
    kept = MF.build_clean_manifest(str(raw), str(out), str(wavdir))
    assert kept == 1
    assert "wav1" in out.read_text()


def test_lrw_dataset_from_npy_tree(tmp_path):
    root = tmp_path / "lrw"
    for word in ["ABOUT", "WORLD"]:
        d = root / word / "train"
        d.mkdir(parents=True)
        clip = np.random.randint(0, 255, size=(29, 96, 96)).astype(np.uint8)
        np.save(d / f"{word}_00001.npy", clip)
    ds = LrwDataset(str(root), "train", frames=30, pad_len=14)
    assert len(ds) == 2
    s = ds[0]
    assert s["clip_u8"].shape == (30, 96, 96)
    assert s["clip_u8"][29].sum() == 0  # zero-padded 30th frame
    assert (s["labels"] != IGNORE_ID).sum() >= 2


def test_lrw1000_audio_stream(tmp_path):
    """Optional fbank+LFR audio features from wav files."""
    import wave
    import struct as _struct
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    sr = 16000
    t = np.arange(sr // 2) / sr
    samples = (0.4 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    with wave.open(str(wavdir / "w1.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    man = tmp_path / "m.txt"
    man.write_text("dir1,w1,x,ni hao,0.0,0.4\n")
    imroot = tmp_path / "images"
    (imroot / "dir1").mkdir(parents=True)
    from sbl_for_multilingual_lip_reading_tpu.data.datasets import (
        Lrw1000Dataset)
    ds = Lrw1000Dataset(str(imroot), str(man), wav_root=str(wavdir),
                        frames=4, raw_size=16)
    s = ds[0]
    assert s["audio"].shape == (88, 320)   # LFR m=4 stacking of 80-dim fbank
    assert np.abs(s["audio"]).sum() > 0
