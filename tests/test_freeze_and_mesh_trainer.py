import dataclasses

import jax
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
from sbl_for_multilingual_lip_reading_tpu.training import Trainer


def _ds(cfg, size=4):
    return SyntheticLipDataset(size=size, frames=cfg.data.frames,
                               raw_size=cfg.data.raw_size)


def test_freeze_prefixes_keeps_frontend_fixed():
    cfg = dataclasses.replace(C.tiny_test("sbl"),
                              freeze_prefixes=("frontend", "encoder"))
    tr = Trainer(cfg, _ds(cfg))
    fe0 = jax.tree_util.tree_leaves(tr.state.params["frontend"])[0].copy()
    enc0 = jax.tree_util.tree_leaves(tr.state.params["encoder"])[0].copy()
    dec0 = jax.tree_util.tree_leaves(tr.state.params["decoder"])[0].copy()
    tr.train_epoch(0, max_steps=2)
    np.testing.assert_array_equal(
        np.asarray(fe0),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params["frontend"])[0]))
    np.testing.assert_array_equal(
        np.asarray(enc0),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params["encoder"])[0]))
    assert not np.allclose(
        np.asarray(dec0),
        np.asarray(jax.tree_util.tree_leaves(tr.state.params["decoder"])[0]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_trainer_with_mesh_config():
    cfg = dataclasses.replace(C.tiny_test("sbl"), batch_size=8,
                              mesh=C.MeshConfig(data=4, model=2))
    tr = Trainer(cfg, _ds(cfg, size=8))
    assert tr.mesh is not None
    with tr.mesh:
        loss = tr.train_epoch(0, max_steps=1)
    assert np.isfinite(loss)
    # tp rule actually sharded the attention kernel
    qs = tr.state.params["decoder"]["step"]["layer_0"]["slf"][
        "w_qs"]["kernel"]
    assert not qs.sharding.is_fully_replicated
