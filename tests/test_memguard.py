"""HBM pre-flight guard (training/memguard.py): the B=264 remat-off OOM
worker-crash class must become a clean MemoryError / auto-remat rebuild."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.training import memguard
from sbl_for_multilingual_lip_reading_tpu.training.memguard import (
    GuardedTrainStep)


def _step(scale=1.0):
    return jax.jit(lambda x: x * scale)


def test_dispatches_when_limits_unknown(monkeypatch):
    monkeypatch.setattr(memguard, "device_hbm_limit", lambda: None)
    g = GuardedTrainStep(_step())
    x = jnp.ones((4,))
    np.testing.assert_allclose(np.asarray(g(x)), 1.0)
    # same-shape second call goes through the compiled executable
    np.testing.assert_allclose(np.asarray(g(x + 1)), 2.0)
    # novel shape falls back to the plain jitted path
    np.testing.assert_allclose(np.asarray(g(jnp.ones((2,)))), 1.0)


def test_raises_clean_memoryerror_when_over_budget(monkeypatch):
    monkeypatch.setattr(memguard, "device_hbm_limit", lambda: 16 << 30)
    monkeypatch.setattr(memguard, "executable_peak_bytes",
                        lambda c: 17 << 30)
    g = GuardedTrainStep(_step())
    with pytest.raises(MemoryError, match="HBM pre-flight"):
        g(jnp.ones((4,)))


def test_auto_remat_rebuild_then_fits(monkeypatch):
    monkeypatch.setattr(memguard, "device_hbm_limit", lambda: 16 << 30)
    peaks = iter([17 << 30, 10 << 30])   # over, then (post-rebuild) fits
    monkeypatch.setattr(memguard, "executable_peak_bytes",
                        lambda c: next(peaks))
    calls = []

    def rebuild():
        calls.append(1)
        return _step(scale=2.0)

    g = GuardedTrainStep(_step(), rebuild=rebuild)
    out = g(jnp.ones((4,)))
    assert calls == [1] and g.rebuilt
    # the dispatched executable is the REBUILT one
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_rebuild_still_over_budget_raises(monkeypatch):
    monkeypatch.setattr(memguard, "device_hbm_limit", lambda: 16 << 30)
    monkeypatch.setattr(memguard, "executable_peak_bytes",
                        lambda c: 20 << 30)
    g = GuardedTrainStep(_step(), rebuild=lambda: _step(2.0))
    with pytest.raises(MemoryError, match="remat"):
        g(jnp.ones((4,)))
    assert g.rebuilt


def test_trainer_wraps_train_step():
    from sbl_for_multilingual_lip_reading_tpu import config as C
    from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
    from sbl_for_multilingual_lip_reading_tpu.training import Trainer
    cfg = C.tiny_test("sbl")
    ds = SyntheticLipDataset(size=4, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds)
    assert isinstance(tr.train_step, GuardedTrainStep)
    # default cfg has remat_frontend False -> the auto-remat hook is wired
    assert tr.train_step._rebuild is not None
