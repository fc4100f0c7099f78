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


@pytest.mark.slow
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


def test_per_replica_batchnorm_matches_manual_shards():
    """sync_batchnorm=False: BN statistics are computed per dp shard
    (DataParallel parity) and differ from the synced global-batch stats;
    running stats track group 0 (the torch source replica)."""
    from sbl_for_multilingual_lip_reading_tpu.models.frontend import (
        GroupedBatchNorm)
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    dp = 4
    B, H, W, Ch = 8, 3, 3, 5
    # make shard distributions differ: shift each group
    x = jax.random.normal(rng, (B, H, W, Ch), jnp.float32)
    x = x + jnp.repeat(jnp.arange(dp, dtype=jnp.float32), B // dp
                       )[:, None, None, None]

    gbn = GroupedBatchNorm(groups=dp, momentum=0.9, epsilon=1e-5)
    variables = gbn.init(rng, x, use_running_average=False)
    mesh = make_mesh(data=dp, model=2)
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))

    @jax.jit
    def fwd(v, x):
        return gbn.apply(v, x, use_running_average=False,
                         mutable=["batch_stats"])

    with mesh:
        y, mut = fwd(variables, xs)
    y = np.asarray(y)

    # manual per-shard computation
    xg = np.asarray(x).reshape(dp, B // dp, H, W, Ch)
    manual = np.empty_like(xg)
    for g in range(dp):
        m = xg[g].mean(axis=(0, 1, 2))
        v = xg[g].var(axis=(0, 1, 2))
        manual[g] = (xg[g] - m) / np.sqrt(v + 1e-5)
    np.testing.assert_allclose(y, manual.reshape(B, H, W, Ch),
                               atol=1e-4, rtol=1e-4)

    # synced BN (global stats) gives a different answer on skewed shards
    sbn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vs = sbn.init(rng, x)
    ys, _ = sbn.apply(vs, x, mutable=["batch_stats"])
    assert np.abs(y - np.asarray(ys)).max() > 0.1

    # running stats follow group 0 only
    m0 = xg[0].mean(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               0.1 * m0, atol=1e-5)


def test_sync_batchnorm_config_selects_grouped_bn():
    from sbl_for_multilingual_lip_reading_tpu.models import build_model
    cfg = C.tiny_test("sbl")
    cfg = dataclasses.replace(cfg, mesh=C.MeshConfig(data=4, model=2,
                                                     sync_batchnorm=False))
    model = build_model(cfg)
    assert model.frontend.bn_groups == 4
    cfg2 = dataclasses.replace(cfg, mesh=C.MeshConfig(data=4, model=2))
    assert build_model(cfg2).frontend.bn_groups == 1
