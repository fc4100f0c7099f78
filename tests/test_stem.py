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
