import jax
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.ops.stem import (
    stack_frames, stack_frames_u8)
from sbl_for_multilingual_lip_reading_tpu.data.pipeline import device_ingest


def _xla_stack(video, kt):
    B, T, S, _ = video.shape
    pad = kt // 2
    xp = jnp.pad(video, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    return jnp.stack([xp[:, i:i + T] for i in range(kt)], axis=2)


def test_stack_frames_matches_xla():
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((3, 6, 16, 16)), jnp.float32)
    out = stack_frames(video, kt=5, interpret=True)
    expect = _xla_stack(video, 5)
    assert out.shape == (3, 6, 5, 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))
    # k = kt//2 is the identity shift
    np.testing.assert_allclose(np.asarray(out[:, :, 2]), np.asarray(video))


def test_stack_frames_u8_matches_ingest_plus_stack():
    rng = np.random.default_rng(1)
    B, T, raw, crop = 2, 5, 32, 24
    clips = jnp.asarray(rng.integers(0, 256, size=(B, T, raw, raw),
                                     dtype=np.uint8))
    out = stack_frames_u8(clips, crop, dtype=jnp.float32, kt=5,
                          interpret=True)
    video = device_ingest(clips, None, None, None, crop, jnp.float32)
    expect = _xla_stack(video, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-5)


def test_stem_conv_nchw_equals_nhwc():
    """The Pallas-stem path feeds the stem conv (B*T, kt, S, S) with NCHW
    dimension_numbers; the XLA path feeds (B*T, S, S, kt) NHWC.  Identical
    math must come out."""
    rng = np.random.default_rng(3)
    N, S, kt, C = 4, 16, 5, 8
    x_nchw = jnp.asarray(rng.standard_normal((N, kt, S, S)), jnp.float32)
    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    k = jnp.asarray(rng.standard_normal((7, 7, kt, C)) * 0.1, jnp.float32)
    kwargs = dict(window_strides=(2, 2), padding=((3, 3), (3, 3)))
    a = jax.lax.conv_general_dilated(
        x_nchw, k, dimension_numbers=("NCHW", "HWIO", "NHWC"), **kwargs)
    b = jax.lax.conv_general_dilated(
        x_nhwc, k, dimension_numbers=("NHWC", "HWIO", "NHWC"), **kwargs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
