import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
from sbl_for_multilingual_lip_reading_tpu.training import Trainer, checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    cfg = C.tiny_test("sbl")
    ds = SyntheticLipDataset(size=4, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds)
    tr.train_epoch(0, max_steps=1)
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, tr.state, epoch=3, best_metric=0.5,
                         is_best=True)

    tr2 = Trainer(cfg, ds)
    state2, epoch, best = ckpt.restore_checkpoint(path, tr2.state)
    assert epoch == 3 and abs(best - 0.5) < 1e-6
    assert int(state2.step) == int(tr.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # best copy exists
    import os
    assert os.path.isdir(path + "_best")


def test_partial_merge_by_shape():
    fresh = {"enc": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
             "dec": {"w": jnp.zeros((3, 3))}}
    pre = {"enc": {"w": jnp.ones((4, 4)), "b": jnp.ones((5,))},  # shape miss
           "extra": {"z": jnp.ones((2,))}}
    merged, loaded, missed = ckpt.partial_merge(fresh, pre, verbose=False)
    np.testing.assert_allclose(np.asarray(merged["enc"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["enc"]["b"]), 0.0)
    np.testing.assert_allclose(np.asarray(merged["dec"]["w"]), 0.0)
    assert loaded == ["enc/w"]
    assert set(missed) == {"enc/b", "dec/w"}


def test_transfer_classify_encoder_into_sbl(tmp_path):
    """The three-stage recipe: classify-stage frontend+encoder seeds the SBL
    model across architecture drift (reference train.py:91-103)."""
    cfg_c = C.tiny_test("classify")
    ds_c = SyntheticLipDataset(size=4, frames=cfg_c.data.frames,
                               raw_size=cfg_c.data.raw_size)
    tr_c = Trainer(cfg_c, ds_c)
    tr_c.train_epoch(0, max_steps=1)
    path = str(tmp_path / "classify_ckpt")
    ckpt.save_checkpoint(path, tr_c.state)

    cfg_s = C.tiny_test("sbl")
    ds_s = SyntheticLipDataset(size=4, frames=cfg_s.data.frames,
                               raw_size=cfg_s.data.raw_size)
    tr_s = Trainer(cfg_s, ds_s)
    before = np.asarray(jax.tree_util.tree_leaves(
        tr_s.state.params["frontend"])[0]).copy()
    new_state, loaded = ckpt.restore_for_transfer(path, tr_s.state)
    # frontend + encoder weights transferred, decoder untouched
    assert any(p.startswith("frontend") for p in loaded)
    assert any(p.startswith("encoder") for p in loaded)
    assert not any(p.startswith("decoder") for p in loaded)
    after = np.asarray(jax.tree_util.tree_leaves(
        new_state.params["frontend"])[0])
    assert not np.allclose(before, after)
