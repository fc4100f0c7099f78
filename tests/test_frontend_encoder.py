import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.models.frontend import VisualFrontend
from sbl_for_multilingual_lip_reading_tpu.models.encoder import Encoder

FE = dict(conv3d_channels=4, resnet_channels=(4, 8, 8, 16),
          resnet_blocks=(1, 1, 1, 1), feature_dim=16, dropout=0.0)


@pytest.fixture(scope="module")
def frontend():
    fe = VisualFrontend(**FE)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 6, 24, 24, 1))
    params = fe.init(rng, x, train=False)
    return fe, params, x


def test_frontend_shapes(frontend):
    fe, params, x = frontend
    out = fe.apply(params, x, train=False)
    assert out.shape == (2, 6, 16)
    # spatial pipeline: 24 -> conv s2 -> 12 -> pool s2 -> 6 -> resnet /8 -> 1
    assert "batch_stats" in params


def test_frontend_temporal_receptive_field(frontend):
    """Conv3D has temporal kernel 5 (pad 2): changing frame t only affects
    features within t±2 (per-frame ResNet adds no temporal mixing)."""
    fe, params, x = frontend
    out1 = fe.apply(params, x, train=False)
    x2 = x.at[:, 5].set(jax.random.normal(jax.random.PRNGKey(7),
                                          (2, 24, 24, 1)))
    out2 = fe.apply(params, x2, train=False)
    np.testing.assert_allclose(np.asarray(out1[:, :3]),
                               np.asarray(out2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, 5]), np.asarray(out2[:, 5]))


def test_frontend_bn_updates_in_train(frontend):
    fe, params, x = frontend
    out, mutated = fe.apply(params, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(0)})
    before = params["batch_stats"]["bn3d"]["mean"]
    after = mutated["batch_stats"]["bn3d"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_encoder_shapes_and_padding():
    enc = Encoder(d_input=16, n_layers=2, n_head=4, d_k=8, d_v=8,
                  d_model=32, d_inner=64, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 7, 16))
    params = enc.init(rng, x)
    out = enc.apply(params, x)
    assert out.shape == (2, 7, 32)

    lengths = jnp.array([4, 7])
    out_m = enc.apply(params, x, lengths)
    # padded positions zeroed by non_pad mask
    np.testing.assert_allclose(np.asarray(out_m[0, 4:]), 0.0, atol=1e-6)
    # valid positions must not attend to padded keys: perturbing the padded
    # tail of sample 0 leaves its valid outputs unchanged
    x2 = x.at[0, 4:].set(123.0)
    out_m2 = enc.apply(params, x2, lengths)
    np.testing.assert_allclose(np.asarray(out_m[0, :4]),
                               np.asarray(out_m2[0, :4]), atol=1e-5)
