import numpy as np

from sbl_for_multilingual_lip_reading_tpu.data import audio as A


def test_peak_normalize_range():
    y = np.random.RandomState(0).randn(1000).astype(np.float32)
    out = A.peak_normalize(y)
    assert abs(out.max() - 0.5) < 1e-6
    assert abs(out.min() + 0.5) < 1e-6
    assert np.all(A.peak_normalize(np.zeros(10)) == 0)


def test_energy_trim_removes_silence():
    sr = 16000
    sig = np.concatenate([np.zeros(sr // 2),
                          0.5 * np.sin(2 * np.pi * 440 *
                                       np.arange(sr) / sr),
                          np.zeros(sr // 2)]).astype(np.float32)
    out = A.energy_trim(sig, sr)
    assert len(out) < len(sig)
    assert len(out) >= sr * 0.9


def test_fbank_shape_and_cmvn():
    sr = 16000
    y = np.sin(2 * np.pi * 300 * np.arange(sr) / sr).astype(np.float32)
    feat = A.extract_fbank(y, sr=sr, dim=80, trim=False)
    # 10 ms hop -> ~100 frames/sec
    assert feat.shape[1] == 80
    assert 90 <= feat.shape[0] <= 110
    # CMVN: per-dim ~zero mean / unit std
    assert np.abs(feat.mean(0)).max() < 1e-4
    assert np.abs(feat.std(0) - 1.0).max() < 1e-2


def test_mel_filterbank_covers_spectrum():
    fb = A.mel_filterbank(16000, 400, 80)
    assert fb.shape == (80, 201)
    # every filter has some mass; adjacent filters overlap
    assert np.all(fb.sum(1) > 0)


def test_lfr_stacking():
    x = np.arange(10 * 2, dtype=np.float32).reshape(10, 2)
    out = A.build_lfr_features(x, m=4, n=3)
    assert out.shape == (4, 8)
    np.testing.assert_array_equal(out[0], x[0:4].reshape(-1))
    np.testing.assert_array_equal(out[1], x[3:7].reshape(-1))
    # tail window: frames 9.. padded by repeating the last frame
    np.testing.assert_array_equal(out[3][:2], x[9])
    np.testing.assert_array_equal(out[3][2:4], x[9])
