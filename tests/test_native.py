import numpy as np
import pytest

from sbl_for_multilingual_lip_reading_tpu.utils import native as N
from sbl_for_multilingual_lip_reading_tpu.utils.metrics import levenshtein


@pytest.fixture(scope="module", autouse=True)
def built():
    if not N.available():
        if not N.build():
            pytest.skip("native toolchain unavailable")


def test_native_levenshtein_matches_python():
    rng = np.random.RandomState(0)
    for _ in range(20):
        a = rng.randint(0, 10, size=rng.randint(0, 15)).tolist()
        b = rng.randint(0, 10, size=rng.randint(0, 15)).tolist()
        assert N.levenshtein_native(a, b) == levenshtein(a, b)


def test_native_clip_batch_uint8(tmp_path):
    paths = []
    clips = []
    for i in range(3):
        clip = np.random.randint(0, 255, size=(29, 16, 16)).astype(np.uint8)
        p = tmp_path / f"c{i}.npy"
        np.save(p, clip)
        paths.append(str(p))
        clips.append(clip)
    out = N.load_clip_batch(paths, frames=30, h=16, w=16)
    assert out.shape == (3, 30, 16, 16)
    for i in range(3):
        np.testing.assert_array_equal(out[i, :29], clips[i])
        assert out[i, 29].sum() == 0  # zero-padded


def test_native_clip_batch_float_scaling(tmp_path):
    clip01 = np.random.rand(5, 8, 8).astype(np.float32)         # [0,1]
    clip255 = (np.random.rand(5, 8, 8) * 255).astype(np.float32)  # [0,255]
    p1, p2 = tmp_path / "a.npy", tmp_path / "b.npy"
    np.save(p1, clip01)
    np.save(p2, clip255)
    out = N.load_clip_batch([str(p1), str(p2)], frames=5, h=8, w=8)
    np.testing.assert_allclose(
        out[0], np.clip(clip01 * 255, 0, 255).astype(np.uint8), atol=1)
    np.testing.assert_allclose(
        out[1], np.clip(clip255, 0, 255).astype(np.uint8), atol=1)


def test_native_clip_batch_bad_path_zero_filled(tmp_path):
    clip = np.random.randint(0, 255, size=(4, 8, 8)).astype(np.uint8)
    p = tmp_path / "ok.npy"
    np.save(p, clip)
    out = N.load_clip_batch([str(p), str(tmp_path / "missing.npy")],
                            frames=4, h=8, w=8)
    np.testing.assert_array_equal(out[0], clip)
    assert out[1].sum() == 0
