"""Pallas training-ingest kernel vs the host-parity plan application."""
import jax.numpy as jnp
import numpy as np

from sbl_for_multilingual_lip_reading_tpu.data import transforms as T
from sbl_for_multilingual_lip_reading_tpu.data.pipeline import device_ingest
from sbl_for_multilingual_lip_reading_tpu.ops.ingest import ingest_train


def _plans(rng, B, Tn, raw, crop, drop_p=0.3):
    return [T.make_train_plan(rng, Tn, raw, crop, frame_removal_p=0.2,
                              random_drop_p=drop_p) for _ in range(B)]


def test_ingest_kernel_matches_host_plan():
    rng = np.random.default_rng(0)
    B, Tn, raw, crop = 4, 6, 24, 16
    clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
    plans = _plans(rng, B, Tn, raw, crop)
    out = ingest_train(
        jnp.asarray(clips),
        jnp.asarray(np.stack([p.offsets for p in plans])),
        jnp.asarray(np.array([p.flip for p in plans])),
        jnp.asarray(np.stack([p.frame_map for p in plans])),
        crop, dtype=jnp.float32, interpret=True)
    for b in range(B):
        expect = T.apply_plan_host(clips[b], plans[b], crop)
        np.testing.assert_allclose(np.asarray(out[b]), expect, atol=1e-5)


def test_ingest_kernel_matches_device_ingest_with_padding():
    """Including n_frames zeroing-after-normalize and bf16 output."""
    rng = np.random.default_rng(1)
    B, Tn, raw, crop = 3, 5, 20, 12
    clips = rng.integers(0, 256, size=(B, Tn, raw, raw), dtype=np.uint8)
    plans = _plans(rng, B, Tn, raw, crop, drop_p=0.0)
    offsets = jnp.asarray(np.stack([p.offsets for p in plans]))
    flip = jnp.asarray(np.array([p.flip for p in plans]))
    fmap = jnp.asarray(np.stack([p.frame_map for p in plans]))
    nf = jnp.asarray(np.array([3, Tn, 1], np.int32))
    got = ingest_train(jnp.asarray(clips), offsets, flip, fmap, crop,
                       dtype=jnp.bfloat16, n_frames=nf, interpret=True)
    expect = device_ingest(jnp.asarray(clips), offsets, flip, fmap, crop,
                           jnp.bfloat16, n_frames=nf)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expect, np.float32), atol=2e-2)
    np.testing.assert_array_equal(np.asarray(got[0, 3:], np.float32), 0.0)
