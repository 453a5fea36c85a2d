"""Golden tests: mel frontend vs transformers' WhisperFeatureExtractor
(the numpy reference implementation of whisper's torch mel pipeline)."""

import numpy as np
import pytest

from openhush_tpu.ops import mel


def _hf_features(audio, n_mels):
    tf = pytest.importorskip("transformers")
    fe = tf.WhisperFeatureExtractor(feature_size=n_mels)
    out = fe(audio, sampling_rate=16000, return_tensors="np",
             padding="max_length")
    return out.input_features[0]  # [n_mels, 3000]


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_transformers(n_mels):
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
    audio += 0.5 * np.sin(2 * np.pi * 440.0 *
                          np.arange(len(audio)) / 16000).astype(np.float32)
    padded = np.asarray(mel.pad_or_trim(audio))
    ours = np.asarray(mel.log_mel_spectrogram(padded, n_mels=n_mels))
    theirs = _hf_features(audio, n_mels)
    assert ours.shape == theirs.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_mel_silence():
    audio = np.zeros(mel.N_SAMPLES, dtype=np.float32)
    ours = np.asarray(mel.log_mel_spectrogram(audio))
    theirs = _hf_features(np.zeros(16000, np.float32), 80)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_mel_filterbank_shape_and_energy():
    fb = mel.mel_filter_bank(80)
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    # Every filter has some support.
    assert (fb.sum(axis=0) > 0).all()


def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert mel.pad_or_trim(x).shape == (mel.N_SAMPLES,)
    long = np.ones(mel.N_SAMPLES + 5, np.float32)
    assert mel.pad_or_trim(long).shape == (mel.N_SAMPLES,)
