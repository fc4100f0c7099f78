import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu import config as C
from sbl_for_multilingual_lip_reading_tpu.data import SyntheticLipDataset
from sbl_for_multilingual_lip_reading_tpu.data.pipeline import Batcher
from sbl_for_multilingual_lip_reading_tpu.parallel import (
    make_mesh, param_spec, shard_batch, shard_params)
from sbl_for_multilingual_lip_reading_tpu.training import Trainer
from sbl_for_multilingual_lip_reading_tpu.training.trainer import attach_plans

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_param_spec_rules():
    mesh = make_mesh(data=4, model=2)
    spec = param_spec("decoder/step/layer_0/slf/w_qs/kernel",
                      (2, 64, 64), mesh)
    assert spec == jax.sharding.PartitionSpec(None, None, "model")
    spec = param_spec("encoder/layer_0/pos_ffn/w_2/kernel", (128, 64), mesh)
    assert spec == jax.sharding.PartitionSpec("model", None)
    # non-divisible dims fall back to replication
    spec = param_spec("x/w_qs/kernel", (64, 63), mesh)
    assert spec == jax.sharding.PartitionSpec()
    # unmatched paths replicate
    assert param_spec("frontend/conv3d/kernel", (5, 7, 7, 1, 64), mesh) \
        == jax.sharding.PartitionSpec()


def test_dp_tp_train_step_matches_single_device():
    """One sharded train step on a 4x2 mesh must agree with the same step on
    a single device (GSPMD collectives preserve math)."""
    cfg = C.tiny_test("sbl")
    cfg = dataclasses.replace(cfg, batch_size=8)
    ds = SyntheticLipDataset(size=8, frames=cfg.data.frames,
                             raw_size=cfg.data.raw_size)
    tr = Trainer(cfg, ds)
    batch = next(iter(Batcher(ds, 8, shuffle=False)))
    batch = attach_plans(batch, np.random.default_rng(0), cfg, train=True)

    _, m_single = tr.train_step(tr.state, batch, tr.rng)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        state_sh = tr.state.replace(
            params=shard_params(tr.state.params, mesh),
            batch_stats=shard_params(tr.state.batch_stats, mesh))
        batch_sh = shard_batch(batch, mesh)
        new_state, m_mesh = tr.train_step(state_sh, batch_sh, tr.rng)
        # params end up sharded per the TP rules
        qs = new_state.params["decoder"]["step"]["layer_0"]["slf"][
            "w_qs"]["kernel"]
        assert not qs.sharding.is_fully_replicated

    assert abs(float(m_single["loss"]) - float(m_mesh["loss"])) < 1e-3
