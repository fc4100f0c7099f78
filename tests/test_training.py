import numpy as np
import pytest

import jax

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
from sbl_for_multilingual_lip_reading_tpu.training import (
    Trainer, decode_to_phonemes)
from sbl_for_multilingual_lip_reading_tpu.vocab import (EOS_ID, IGNORE_ID,
                                                        SOS_ID,
                                                        TOTAL_PHONEMES)


def _dataset(cfg, size=8, kind="all"):
    vocab = cfg.name if cfg.name in ("lrw", "lrw1000") else "sbl"
    if cfg.name == "lrw":
        kind = "lrw"
    elif cfg.name == "lrw1000":
        kind = "lrw1000"
    return SyntheticLipDataset(size=size, frames=cfg.data.frames,
                               raw_size=cfg.data.raw_size, pad_len=14,
                               kind=kind, vocab=vocab)


@pytest.mark.parametrize("name", ["sbl", "lrw", "classify"])
def test_train_step_runs_and_updates(name):
    cfg = C.tiny_test(name)
    tr = Trainer(cfg, _dataset(cfg, size=4))
    p0 = jax.tree_util.tree_leaves(tr.state.params)[0].copy()
    loss = tr.train_epoch(0, max_steps=2)
    assert np.isfinite(loss)
    assert int(tr.state.step) == 2
    p1 = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_sbl_loss_decreases_on_fixed_batch():
    cfg = C.tiny_test("sbl")
    ds = _dataset(cfg, size=2)
    tr = Trainer(cfg, ds)
    losses = []
    for _ in range(6):
        losses.append(tr.train_epoch(0, max_steps=1))
    assert losses[-1] < losses[0], losses


def test_sbl_validate_reports_all_metrics():
    cfg = C.tiny_test("sbl")
    ds = _dataset(cfg, size=4)
    tr = Trainer(cfg, ds)
    out = tr.validate_seq2seq(ds, max_batches=1)
    for k in ("l2r_wer", "l2r_per", "r2l_wer", "r2l_per"):
        assert k in out and 0.0 <= out[k] <= 4.0


def test_classify_validate():
    cfg = C.tiny_test("classify")
    ds = _dataset(cfg, size=4)
    tr = Trainer(cfg, ds)
    out = tr.validate_classify(ds, max_batches=1)
    assert 0.0 <= out["word_acc"] <= 1.0
    assert 0.0 <= out["lang_acc"] <= 1.0


def test_decode_protocol_gold_length_truncation():
    # prediction longer than gold must be cut to len(gold)+1 raw tokens
    # before filtering (reference test.py:185-188)
    gold = [3, 4, IGNORE_ID, IGNORE_ID]
    pred = [SOS_ID, 3, 4, 9, 9, 9, EOS_ID]
    preds, golds = decode_to_phonemes(pred, gold)
    assert golds == [TOTAL_PHONEMES[3], TOTAL_PHONEMES[4]]
    # raw truncation to 2+1=3 tokens: [sos, 3, 4] -> filtered [3, 4]
    assert preds == [TOTAL_PHONEMES[3], TOTAL_PHONEMES[4]]


def test_two_stream_sampler_wired_into_trainer(tmp_path):
    """cfg.secondary_batch_size routes train batches through
    TwoStreamBatchSampler: every batch holds a fixed LRW:LRW-1000 ratio
    (reference classify data_gen.py:340-367)."""
    import dataclasses
    cfg = dataclasses.replace(C.tiny_test("classify"), batch_size=4,
                              secondary_batch_size=1)
    ds = _dataset(cfg, size=12, kind="all")
    tr = Trainer(cfg, ds)
    sampler = tr._make_sampler(0)
    assert sampler is not None
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import Batcher
    for batch in Batcher(ds, cfg.batch_size, sampler=sampler):
        lang = np.asarray(batch["lang_id"])
        assert (lang == 1).sum() == 1 and (lang == 0).sum() == 3
    # a dataset without stream_indices() fails loudly
    class NoStreams:
        def __len__(self):
            return 4
    tr2 = Trainer(cfg, ds)
    tr2.train_dataset = NoStreams()
    with pytest.raises(ValueError, match="stream_indices"):
        tr2._make_sampler(0)
    # and a train_epoch through the sampler actually runs
    loss = tr.train_epoch(0, max_steps=2)
    assert np.isfinite(loss)


def test_profile_dir_writes_trace(tmp_path):
    """--profile-dir captures a device trace during epoch 0 (SURVEY §5)."""
    import os
    cfg = C.tiny_test("sbl")
    tr = Trainer(cfg, _dataset(cfg, size=8), profile_dir=str(tmp_path))
    tr.train_epoch(0, max_steps=4)
    produced = []
    for root, _, files in os.walk(tmp_path):
        produced.extend(files)
    assert any(f.endswith((".pb", ".json.gz", ".trace.json.gz", ".xplane.pb"))
               for f in produced), produced


@pytest.mark.slow
def test_device_cache_epoch_matches_host_path(monkeypatch):
    """cache_on_device gathers batches on-device by index; the training
    stream (shuffle order, plans, losses) must match the host Batcher
    path exactly -- through BOTH cached routes: the epoch-fused step
    (gather inside the jitted step, the default) and the per-step
    generator fallback (SBL_NO_EPOCH_FUSED=1)."""
    import dataclasses
    from sbl_for_multilingual_lip_reading_tpu.data import (
        SyntheticPatternDataset)
    cfg = C.tiny_test("sbl")
    cfg = dataclasses.replace(cfg, batch_size=4)
    mk = dict(n_words=4, samples_per_word=3, frames=cfg.data.frames,
              raw_size=cfg.data.raw_size)
    losses = []
    for cache, fused in ((False, False), (True, True), (True, False)):
        if fused:
            monkeypatch.delenv("SBL_NO_EPOCH_FUSED", raising=False)
        else:
            monkeypatch.setenv("SBL_NO_EPOCH_FUSED", "1")
        ds = SyntheticPatternDataset(**mk)
        tr = Trainer(cfg, ds, cache_on_device=cache)
        losses.append([tr.train_epoch(e) for e in range(2)])
    assert all(np.isfinite(l) for l in losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-5)


@pytest.mark.slow
def test_fused_epoch_rng_parity_after_truncated_epoch(monkeypatch):
    """A max_steps-truncated fused epoch must advance the shared host plan
    RNG exactly as far as the generator path: the epoch-fused _epoch_const
    used to pre-draw the WHOLE epoch's augmentation plans, so the two
    cached routes diverged after any truncated smoke/resume epoch."""
    import dataclasses
    from sbl_for_multilingual_lip_reading_tpu.data import (
        SyntheticPatternDataset)
    cfg = C.tiny_test("sbl")
    cfg = dataclasses.replace(cfg, batch_size=4)
    mk = dict(n_words=4, samples_per_word=3, frames=cfg.data.frames,
              raw_size=cfg.data.raw_size)
    losses = []
    for fused in (True, False):
        if fused:
            monkeypatch.delenv("SBL_NO_EPOCH_FUSED", raising=False)
        else:
            monkeypatch.setenv("SBL_NO_EPOCH_FUSED", "1")
        tr = Trainer(cfg, SyntheticPatternDataset(**mk),
                     cache_on_device=True)
        # epoch 0 truncated to one step, epoch 1 full: epoch 1's plan
        # draws depend on how far epoch 0 advanced the np_rng stream
        losses.append([tr.train_epoch(0, max_steps=1), tr.train_epoch(1)])
    assert all(np.isfinite(l) for l in losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


@pytest.mark.slow
def test_donating_train_step_chains():
    """Trainer donates the input state on TPU (steps.py donate=True): the
    step must be re-callable chained through its own output.  On the CPU
    backend donation is ignored with a warning; this pins the wiring and
    the chained-usage contract either way."""
    import warnings
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    from sbl_for_multilingual_lip_reading_tpu.training.steps import (
        make_sbl_train_step)
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        init_state)
    cfg = C.tiny_test("sbl")
    model = build_model(cfg)
    state, tx = init_state(model, cfg, jax.random.PRNGKey(0))
    step = make_sbl_train_step(model, tx, cfg, donate=True)
    ds = _dataset(cfg, size=4)
    from sbl_for_multilingual_lip_reading_tpu.data.pipeline import Batcher
    from sbl_for_multilingual_lip_reading_tpu.training.trainer import (
        attach_plans)
    batch = next(iter(Batcher(ds, batch_size=2, shuffle=False)))
    batch = attach_plans(batch, np.random.default_rng(0), cfg, train=True)
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()
             if k in ("clip_u8", "labels", "labels_reverse", "offsets",
                      "flip", "frame_map")}
    rng = jax.random.PRNGKey(1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # cpu "donation not implemented"
        s1, m1 = step(state, batch, rng)
        s2, m2 = step(s1, batch, rng)
    assert int(s2.step) == 2
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_epoch_fused_matches_stepwise(monkeypatch):
    """The mesh epoch-fused step (shard-local batch gather under
    jax.shard_map, steps.py::make_epoch_fused_step_mesh) must produce the
    same loss sequence as feeding the IDENTICAL stratified batches through
    the plain GSPMD train step with host-side assembly.  Also pins the
    DistributedSampler-style invariant: every order column block stays
    inside its shard's resident dataset rows."""
    import dataclasses
    from sbl_for_multilingual_lip_reading_tpu.data import (
        SyntheticPatternDataset)
    from sbl_for_multilingual_lip_reading_tpu.parallel import batch_sharding
    monkeypatch.delenv("SBL_NO_EPOCH_FUSED", raising=False)
    cfg = dataclasses.replace(C.tiny_test("sbl"), batch_size=8,
                              mesh=C.MeshConfig(data=4, model=2))
    mk = dict(n_words=4, samples_per_word=4, frames=cfg.data.frames,
              raw_size=cfg.data.raw_size)
    n_probe = 2

    tr1 = Trainer(cfg, SyntheticPatternDataset(**mk), cache_on_device=True)
    assert tr1._mesh_fused_ok()
    with tr1.mesh:
        step_fn = tr1._ensure_fused_step()
        const, n_steps = tr1._epoch_const_mesh(0)
        assert n_steps >= n_probe
        fused = []
        for _ in range(n_probe):
            tr1.state, m = step_fn(tr1.state, const, tr1.rng)
            fused.append(float(m["loss"]))

    ds2 = SyntheticPatternDataset(**mk)
    tr2 = Trainer(cfg, ds2, cache_on_device=True)
    with tr2.mesh:
        const2, _ = tr2._epoch_const_mesh(0)
        order = np.asarray(jax.device_get(const2["order"]))
        dp = tr2.mesh.shape["data"]
        Bl, Nl = cfg.batch_size // dp, len(ds2) // dp
        for d in range(dp):  # shard-local invariant
            block = order[:, d * Bl:(d + 1) * Bl]
            assert block.min() >= d * Nl and block.max() < (d + 1) * Nl
        clips = np.stack([ds2[i]["clip_u8"] for i in range(len(ds2))])
        per_step = {k: np.asarray(jax.device_get(v))
                    for k, v in const2["per_step"].items()}
        sharding = batch_sharding(tr2.mesh)
        manual = []
        for i in range(n_probe):
            idx = order[i]
            batch = {k: v[idx] for k, v in tr2._host_small.items()}
            batch["clip_u8"] = clips[idx]
            for k, v in per_step.items():
                batch[k] = v[i]
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
            tr2.state, m = tr2.train_step(tr2.state, batch, tr2.rng)
            manual.append(float(m["loss"]))
    np.testing.assert_allclose(fused, manual, rtol=1e-5)
