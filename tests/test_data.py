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


def test_background_iter_order_exception_and_close():
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import (
        background_iter)
    # order preserved, fully drained
    assert list(background_iter(iter(range(20)), depth=3)) == list(range(20))
    assert list(background_iter(iter([]), depth=1)) == []

    # producer exceptions re-raise in the consumer after queued items drain
    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")
    got = []
    with pytest.raises(ValueError, match="producer failed"):
        for x in background_iter(boom()):
            got.append(x)
    assert got == [1, 2]

    # early close stops the producer thread and closes the source
    closed = []
    def src():
        try:
            for i in range(1000):
                yield i
        finally:
            closed.append(True)
    it = background_iter(src(), depth=1)
    assert next(it) == 0
    it.close()
    import time as _t
    for _ in range(50):           # producer close is asynchronous
        if closed:
            break
        _t.sleep(0.05)
    assert closed


def test_background_iter_early_close_no_thread_leak():
    """Early close must terminate the producer thread promptly even when
    an in-flight q.put refills the slot the consumer's drain freed (the
    old one-shot drain left the producer blocked forever on its untimed
    q.put(_END): each close then stalled the 5 s join and leaked a daemon
    thread pinning one queued batch)."""
    import threading
    import time as _t
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import (
        background_iter)

    def src():
        i = 0
        while True:
            yield i
            i += 1

    t0 = _t.monotonic()
    for _ in range(20):
        it = background_iter(src(), depth=1)
        assert next(it) is not None
        it.close()
    elapsed = _t.monotonic() - t0
    # each leaked close stalls ~5 s in join; 20 clean closes are sub-second
    assert elapsed < 10.0, f"early closes took {elapsed:.1f}s (leak stall?)"
    deadline = _t.monotonic() + 5.0
    while _t.monotonic() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "batch-producer" and t.is_alive()]
        if not alive:
            break
        _t.sleep(0.05)
    assert not alive, f"{len(alive)} producer thread(s) leaked"


@pytest.mark.slow
def test_train_epoch_background_batches_match_inline(monkeypatch):
    """The threaded epoch loop must consume exactly the inline batch
    stream: same loss sequence with and without the producer thread."""
    import dataclasses
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer

    cfg = C.tiny_test("sbl")
    cfg = dataclasses.replace(cfg, batch_size=4)
    ds = SyntheticLipDataset(size=8, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)

    def run(no_bg):
        if no_bg:
            monkeypatch.setenv("SBL_NO_BG_BATCH", "1")
        else:
            monkeypatch.delenv("SBL_NO_BG_BATCH", raising=False)
        tr = Trainer(cfg, ds)
        return [tr.train_epoch(e) for e in range(2)]

    assert run(no_bg=True) == run(no_bg=False)


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


def _write_wav(path, n_samples, truncate_to=None):
    import wave
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.ones(n_samples, np.int16).tobytes())
    if truncate_to is not None:
        data = path.read_bytes()[:truncate_to]
        path.write_bytes(data)


def test_clean_manifest_silence_filter(tmp_path):
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    _write_wav(wavdir / "wav1.wav", 1000)
    _write_wav(wavdir / "wav4.wav", 0)               # header-only: silent
    raw = tmp_path / "raw.txt"
    raw.write_text("dir1,wav1,x,ni hao,0.0,0.4\ndir4,wav4,x,ma,0.0,0.4\n")
    out = tmp_path / "clean.txt"
    kept = MF.build_clean_manifest(str(raw), str(out), str(wavdir))
    assert kept == 1
    assert "wav1" in out.read_text()


def test_wav_is_silent_riff_probe(tmp_path):
    """The probe must reject wavs whose *payload* is missing, not just
    header-only files (reference decodes and checks sample count,
    SBL data_gen.py:175-177)."""
    good = tmp_path / "good.wav"
    _write_wav(good, 500)
    assert not MF.wav_is_silent(str(good))
    # valid 44-byte header claiming 500 samples, payload truncated away
    trunc = tmp_path / "trunc.wav"
    _write_wav(trunc, 500, truncate_to=44)
    assert MF.wav_is_silent(str(trunc))
    # garbage bytes of plausible size: not RIFF at all
    junk = tmp_path / "junk.wav"
    junk.write_bytes(b"\x00" * 2000)
    assert MF.wav_is_silent(str(junk))
    assert MF.wav_is_silent(str(tmp_path / "missing.wav"))


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


def test_lrw_dataset_word_ids_and_n_frames(tmp_path):
    """Classify labels: LRW word -> index into words_1500.txt[:500]
    (reference classify data_gen.py:161), plus valid-frame count."""
    from sbl_for_multilingual_lip_reading_tpu.vocab import words_1500
    root = tmp_path / "lrw"
    for word in ["ABOUT", "WORLD"]:
        d = root / word / "train"
        d.mkdir(parents=True)
        clip = np.random.randint(0, 255, size=(29, 96, 96)).astype(np.uint8)
        np.save(d / f"{word}_00001.npy", clip)
    ds = LrwDataset(str(root), "train", frames=30, pad_len=14)
    words = words_1500()
    got = {words[int(ds[i]["word_id"])] for i in range(2)}
    assert got == {"ABOUT", "WORLD"}
    assert all(int(ds[i]["word_id"]) < 500 for i in range(2))
    assert int(ds[0]["n_frames"]) == 29


def test_lrw1000_dataset_word_ids(tmp_path):
    """LRW-1000 pinyin entry -> 500+offset index (classify data_gen.py:174)."""
    from sbl_for_multilingual_lip_reading_tpu.data.datasets import (
        Lrw1000Dataset, word_class_id)
    from sbl_for_multilingual_lip_reading_tpu.vocab import words_1500
    man = tmp_path / "m.txt"
    man.write_text("dir1,w1,x,zhong guo,0.0,0.4\n")
    imroot = tmp_path / "images"
    (imroot / "dir1").mkdir(parents=True)
    ds = Lrw1000Dataset(str(imroot), str(man), frames=4, raw_size=16)
    s = ds[0]
    wid = int(s["word_id"])
    assert wid >= 500 and words_1500()[wid] == "zhong guo"
    assert int(s["n_frames"]) == 0  # no jpgs on disk
    assert word_class_id("not a real word") == -1


def test_device_ingest_zeroes_time_padding():
    """Pad slots must be 0.0 post-normalization (reference pads AFTER
    ColorNormalize, data_gen.py:293-295)."""
    rng = np.random.default_rng(0)
    B, Tn, raw, crop = 2, 6, 32, 24
    clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
    clips[0, 4:] = 0  # simulate dataset zero-padding
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import (
        device_ingest)
    plans = [T.make_eval_plan(Tn, raw, crop) for _ in range(B)]
    out = device_ingest(
        jnp.asarray(clips),
        jnp.asarray(np.stack([p.offsets for p in plans])),
        jnp.asarray(np.array([p.flip for p in plans])),
        jnp.asarray(np.stack([p.frame_map for p in plans])),
        crop, n_frames=jnp.asarray(np.array([4, Tn], np.int32)))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[0, 4:], 0.0)      # pad slots zeroed
    assert np.abs(out[0, :4]).sum() > 0                 # valid frames kept
    assert np.abs(out[1]).sum() > 0                     # full clip untouched
    # without n_frames, a zero uint8 frame normalizes to (0 - mean)/std
    out2 = np.asarray(device_ingest(
        jnp.asarray(clips),
        jnp.asarray(np.stack([p.offsets for p in plans])),
        jnp.asarray(np.array([p.flip for p in plans])),
        jnp.asarray(np.stack([p.frame_map for p in plans])), crop))
    np.testing.assert_allclose(out2[0, 5], (0.0 - T.MEAN) / T.STD, atol=1e-6)


def test_device_ingest_static_eval_path_matches_explicit():
    """offsets/flip/frame_map = None (slice fast path) must equal the
    explicit center-crop / no-flip / identity-map gather path."""
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import (
        device_ingest)
    rng = np.random.default_rng(1)
    B, Tn, raw, crop = 2, 5, 32, 24
    clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
    c = int(round((raw - crop) / 2.0))
    offsets = np.full((B, Tn, 2), c, np.int32)
    flip = np.zeros((B,), bool)
    fmap = np.broadcast_to(np.arange(Tn, dtype=np.int32), (B, Tn)).copy()
    a = device_ingest(jnp.asarray(clips), jnp.asarray(offsets),
                      jnp.asarray(flip), jnp.asarray(fmap), crop)
    b = device_ingest(jnp.asarray(clips), None, None, None, crop)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_ingest_gather_crop_matches_numpy():
    """The two-axis-gather crop must reproduce per-frame numpy slicing."""
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import (
        device_ingest)
    rng = np.random.default_rng(2)
    B, Tn, raw, crop = 2, 4, 16, 9
    clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
    offs = rng.integers(0, raw - crop + 1, size=(B, Tn, 2)).astype(np.int32)
    out = np.asarray(device_ingest(jnp.asarray(clips), jnp.asarray(offs),
                                   None, None, crop))
    for b in range(B):
        for t in range(Tn):
            y, x = offs[b, t]
            ref = clips[b, t, y:y + crop, x:x + crop].astype(np.float64)
            ref = (ref / 255.0 - T.MEAN) / T.STD
            np.testing.assert_allclose(out[b, t], ref, atol=1e-5)


def test_device_ingest_select_crop_matches_gather():
    """The select-based crop (offset range <= 8) must agree with the
    gather fallback (exercised here via an offset range > 8)."""
    from sbl_for_multilingual_lip_reading_tpu.data import pipeline as P
    rng = np.random.default_rng(5)
    B, Tn, crop = 2, 4, 8
    raw_small = crop + P.MAX_SELECT_OFFSET       # select path
    raw_large = crop + P.MAX_SELECT_OFFSET + 2   # gather path
    for raw in (raw_small, raw_large):
        clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
        offs = rng.integers(0, raw - crop + 1,
                            size=(B, Tn, 2)).astype(np.int32)
        flip = rng.random(B) < 0.5
        fmap = rng.integers(0, Tn, size=(B, Tn)).astype(np.int32)
        out = np.asarray(P.device_ingest(
            jnp.asarray(clips), jnp.asarray(offs), jnp.asarray(flip),
            jnp.asarray(fmap), crop))
        for b in range(B):
            src = clips[b, fmap[b], :, :]
            for t in range(Tn):
                y, x = offs[b, t]
                ref = src[t, y:y + crop, x:x + crop].astype(np.float64)
                ref = (ref / 255.0 - T.MEAN) / T.STD
                if flip[b]:
                    ref = ref[:, ::-1]
                np.testing.assert_allclose(out[b, t], ref, atol=1e-5)


def test_batcher_strided_multihost_ragged_tail():
    """Every sample lands on exactly one host, including the ragged tail."""
    ds = SyntheticLipDataset(size=10, frames=2, raw_size=8)
    seen = []
    for p in range(2):
        b = Batcher(ds, batch_size=4, shuffle=False, drop_last=False,
                    process_index=p, process_count=2)
        for batch in b:
            seen.append(batch["labels"].shape[0])
    # 10 samples over batches of 4 (global): 4+4+2 -> per host 2+2+1
    assert sum(seen) == 10


def test_attach_plans_per_dataset_crop():
    """LRW: per-frame offsets in [0, raw-crop]; LRW-1000: one per-clip
    offset in [0, (raw-crop)//2] (reference data_gen.py:63-66)."""
    import dataclasses as dc
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        attach_plans)
    cfg = C.tiny_test("sbl")
    raw, crop = 40, cfg.data.crop_size
    B, Tn = 6, 8
    batch = {
        "clip_u8": np.zeros((B, Tn, raw, raw), np.uint8),
        "lang_id": np.array([0, 1] * 3, np.int32),
    }
    rng = np.random.default_rng(0)
    out = attach_plans(batch, rng, cfg, train=True)
    offs = out["offsets"]
    border = (raw - crop) // 2
    for i in range(B):
        if batch["lang_id"][i] == 1:
            # per-clip: all frames share one offset, bounded by border
            assert (offs[i] == offs[i, 0]).all()
            assert offs[i].max() <= border
        else:
            assert offs[i].max() <= raw - crop
    # per-frame draws virtually surely differ across frames for some clip
    lrw_offs = offs[np.asarray(batch["lang_id"]) == 0]
    assert any((o != o[0]).any() for o in lrw_offs)


def test_random_drop_map_matches_reference_loop():
    """random_drop_map must reproduce the LRW project's RandomDrop scan
    (VSR_..._LRW/cvtransforms.py:32-41) for the same random draws."""
    for seed in range(20):
        Tn = 29
        draws = np.random.default_rng(seed).random(Tn)

        # direct simulation of the reference loop on frame indices
        buf = list(range(Tn))
        i = 0
        for j in range(Tn):
            if 0.01 < draws[j] or min(10, 0.2 * Tn) < 1.0 * (j - i):
                buf[i] = buf[j]
                i += 1
        for j in range(i, Tn):
            buf[j] = buf[j - 1]

        class FixedDraws:
            def __init__(self, d):
                self._d = list(d)

            def random(self):
                return self._d.pop(0)

        got = T.random_drop_map(FixedDraws(draws), Tn, p=0.01)
        np.testing.assert_array_equal(got, np.asarray(buf, np.int32))


def test_make_train_plan_random_drop_composition():
    """With random_drop_p, the plan's gather must equal host-applied
    crop -> RandomDrop on the same draws (the LRW data_gen.py:137-140
    ordering: RandomDrop acts on already-cropped frames)."""
    rng = np.random.default_rng(3)
    Tn, raw, crop = 12, 16, 9
    clip = np.random.default_rng(0).integers(
        0, 256, size=(Tn, raw, raw)).astype(np.uint8)
    plan = T.make_train_plan(rng, Tn, raw, crop, frame_removal_p=0.0,
                             per_frame_offsets=False, random_drop_p=0.5)
    got = T.apply_plan_host(clip, plan, crop)
    # reconstruct: same per-clip offset, host random_drop on cropped frames
    y, x = plan.offsets[0]
    cropped = clip[:, y:y + crop, x:x + crop].astype(np.float32) / 255.0
    cropped = T.color_normalize(cropped)
    if plan.flip:
        cropped = cropped[:, :, ::-1]
    expect = cropped[plan.frame_map]
    np.testing.assert_allclose(got, expect, atol=1e-5)
    assert len(np.unique(plan.frame_map)) < Tn  # p=0.5: some frame dropped


def test_lrw_preset_wires_random_drop():
    """--workload lrw trains with the LRW project's protocol: per-clip crop,
    RandomDrop active, FrameRemoval off."""
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        attach_plans)
    cfg = C.lrw_seq2seq()
    assert cfg.data.random_drop_p > 0 and cfg.data.frame_removal_p == 0
    assert cfg.data.per_clip_crop
    B, Tn, raw = 4, 29, 96
    batch = {"clip_u8": np.zeros((B, Tn, raw, raw), np.uint8),
             "lang_id": np.zeros(B, np.int32)}
    out = attach_plans(batch, np.random.default_rng(0), cfg, train=True)
    offs = out["offsets"]
    for i in range(B):
        assert (offs[i] == offs[i, 0]).all()        # per-clip offset
        assert offs[i].max() <= raw - cfg.data.crop_size
    # frame maps must be monotone non-decreasing pack-and-fill gathers
    fmap = out["frame_map"]
    assert (np.diff(fmap, axis=1) >= 0).all()


def test_real_datasets_respect_workload_vocab(tmp_path):
    """The lrw/lrw1000 workloads use their own 42/48-token vocabs; real
    datasets must encode labels in the requested table, not the unified
    58-token one (caught live: bigram build crashed with id 52 >= 48)."""
    from sbl_for_multilingual_lip_reading_tpu.data.datasets import (
        Lrw1000Dataset)
    from sbl_for_multilingual_lip_reading_tpu.vocab import (LRW_PHONEMES,
                                                            LRW1000_PHONEMES)
    root = tmp_path / "lrw"
    d = root / "ABOUT" / "train"
    d.mkdir(parents=True)
    np.save(d / "ABOUT_00001.npy", np.zeros((4, 16, 16), np.uint8))
    ds = LrwDataset(str(root), "train", frames=4, pad_len=12, vocab="lrw")
    lab = ds[0]["labels"]
    assert lab[lab != IGNORE_ID].max() < len(LRW_PHONEMES)
    man = tmp_path / "m.txt"
    man.write_text("dir1,w1,x,zhong guo,0.0,0.4\n")
    (tmp_path / "images" / "dir1").mkdir(parents=True)
    ds2 = Lrw1000Dataset(str(tmp_path / "images"), str(man), frames=4,
                         raw_size=16, vocab="lrw1000")
    lab2 = ds2[0]["labels"]
    assert lab2[lab2 != IGNORE_ID].max() < len(LRW1000_PHONEMES)
    # default stays the unified vocab (SBL workload)
    ds3 = Lrw1000Dataset(str(tmp_path / "images"), str(man), frames=4,
                         raw_size=16)
    assert not np.array_equal(ds3[0]["labels"], lab2)


def test_make_train_plans_batched_structure():
    """The vectorized batch builder must produce plans with the exact
    semantics of per-sample make_train_plan: offset ranges per protocol,
    FrameRemoval as a running-max gather carrying its source's crop, and
    flip ~ Bernoulli(0.5)."""
    rng = np.random.default_rng(0)
    B, Tn, raw, crop = 64, 29, 96, 88
    lang = (np.arange(B) % 2).astype(np.int32)    # half LRW, half LRW-1000
    per_frame = lang == 0
    clip_hi = np.where(lang == 0, raw - crop, (raw - crop) // 2)
    offs, flip, fmap = T.make_train_plans(
        rng, B, Tn, raw, crop, frame_removal_p=0.3,
        per_frame_mask=per_frame, clip_hi=clip_hi)
    assert offs.shape == (B, Tn, 2) and fmap.shape == (B, Tn)
    assert offs.dtype == np.int32 and fmap.dtype == np.int32
    # LRW-1000 rows: ONE offset per clip, bounded by the jpg border 4
    for b in np.flatnonzero(lang == 1):
        assert np.all(offs[b] == offs[b, 0])
        assert 0 <= offs[b, 0, 0] <= 4 and 0 <= offs[b, 0, 1] <= 4
    # LRW rows: per-frame offsets in [0, 8]; with p=0.3 some frames repeat
    lrw = offs[lang == 0]
    assert lrw.min() >= 0 and lrw.max() <= raw - crop
    # frame_map: valid running-max (non-decreasing, fmap[t] <= t, 0 first)
    assert np.all(fmap[:, 0] == 0)
    assert np.all(np.diff(fmap, axis=1) >= 0)
    assert np.all(fmap <= np.arange(Tn))
    assert 0.2 < float(np.mean(fmap[:, 1:] == fmap[:, :-1])) < 0.4
    # duplicated frames carry the source frame's crop offsets: the offsets
    # are already gathered through fmap, so re-gathering is a no-op
    regath = np.take_along_axis(offs, fmap[..., None], axis=1)
    np.testing.assert_array_equal(regath, offs)
    assert 0.3 < flip.mean() < 0.7


def test_make_train_plans_random_drop_matches_sequential():
    """p=1.0 makes RandomDrop deterministic (every coin is a candidate, the
    cap truncates): the batched cap-prefix construction must equal the
    sequential reference scan exactly."""
    Tn = 29
    expect = T.random_drop_map(np.random.default_rng(0), Tn, p=1.0)
    rng = np.random.default_rng(1)
    offs, flip, fmap = T.make_train_plans(
        rng, 4, Tn, 96, 88, frame_removal_p=0.0, random_drop_p=1.0)
    for b in range(4):
        np.testing.assert_array_equal(fmap[b], expect)
    # and p->0 keeps the identity map
    offs, _, fmap0 = T.make_train_plans(
        np.random.default_rng(2), 4, Tn, 96, 88, frame_removal_p=0.0,
        random_drop_p=1e-12)
    np.testing.assert_array_equal(fmap0, np.broadcast_to(np.arange(Tn),
                                                         (4, Tn)))


def test_make_train_plans_drop_rate_matches_sequential():
    """Statistical parity of the batched RandomDrop with the sequential
    scan at the production p (same mean kept-length behavior)."""
    Tn, p, n = 29, 0.2, 400
    rng = np.random.default_rng(3)
    seq = np.array([len(np.unique(T.random_drop_map(rng, Tn, p=p)))
                    for _ in range(n)], np.float64)
    _, _, fmap = T.make_train_plans(np.random.default_rng(4), n, Tn, 96, 88,
                                    frame_removal_p=0.0, random_drop_p=p)
    bat = np.array([len(np.unique(r)) for r in fmap], np.float64)
    assert abs(seq.mean() - bat.mean()) < 0.5, (seq.mean(), bat.mean())
