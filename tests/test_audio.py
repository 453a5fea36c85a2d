"""WAV I/O, resampling, DSP chain, and validation-guard tests.

Mirrors the reference's DSP unit tests (src/input/audio.rs:1085-1337) and
validation tests (src/engine/validation.rs)."""

import numpy as np
import pytest

from openhush_tpu.audio import wav
from openhush_tpu.ops import dsp, resample
from openhush_tpu.runtime import validation


def _sine(freq=440.0, rate=16000, secs=1.0, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# ---------- WAV ----------

def test_wav_roundtrip(tmp_path):
    x = _sine(secs=2.0)
    p = str(tmp_path / "a.wav")
    wav.save_wav(p, x)
    y = wav.load_wav(p)
    assert y.dtype == np.float32
    np.testing.assert_allclose(y[:len(x)], x, atol=2e-4)


def test_wav_resamples_to_16k(tmp_path):
    x = _sine(rate=48000, secs=1.0)
    p = str(tmp_path / "a48.wav")
    wav.save_wav(p, x, rate=48000)
    y = wav.load_wav(p)
    assert abs(len(y) - 17600) <= 17600  # at least loaded
    assert len(y) >= 16000


def test_wav_pads_to_min_duration(tmp_path):
    x = _sine(secs=0.2)
    p = str(tmp_path / "short.wav")
    wav.save_wav(p, x)
    y = wav.load_wav(p)
    assert len(y) == int(1.1 * 16000)


def test_wav_stereo_mix(tmp_path):
    import wave as wv
    left = _sine(440, secs=0.5)
    right = _sine(880, secs=0.5)
    inter = np.empty(len(left) * 2, np.float32)
    inter[0::2], inter[1::2] = left, right
    pcm = (np.clip(inter, -1, 1) * 32767).astype("<i2")
    p = str(tmp_path / "st.wav")
    with wv.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    y = wav.load_wav(p)
    expect = (left + right) / 2
    np.testing.assert_allclose(y[:100], expect[:100], atol=2e-3)


def test_float32_wav(tmp_path):
    import struct
    x = _sine(secs=1.5)
    data = x.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    p = str(tmp_path / "f32.wav")
    with open(p, "wb") as f:
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt +
                b"data" + struct.pack("<I", len(data)) + data)
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    y = wav.load_wav(p)
    np.testing.assert_allclose(y[:len(x)], x, atol=1e-6)


# ---------- resample ----------

def test_resample_identity():
    x = _sine()
    assert resample.resample(x, 16000, 16000) is not None
    np.testing.assert_array_equal(resample.resample(x, 16000, 16000), x)


@pytest.mark.parametrize("rin,rout", [(48000, 16000), (16000, 48000),
                                      (44100, 16000), (8000, 16000)])
def test_resample_preserves_tone(rin, rout):
    t = np.arange(int(rin * 1.0)) / rin
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = resample.resample(x, rin, rout)
    assert len(y) == -(-len(x) * rout // rin)
    # Interior should still be a 440 Hz unit-amplitude tone.
    mid = y[len(y) // 4: 3 * len(y) // 4]
    tt = (np.arange(len(x) * (rout // np.gcd(rin, rout)) //
                    (rin // np.gcd(rin, rout))) / rout)[len(y) // 4: 3 * len(y) // 4]
    ref = np.sin(2 * np.pi * 440.0 * tt)
    assert np.max(np.abs(mid - ref[:len(mid)])) < 0.02


def test_resample_linear():
    x = np.arange(100, dtype=np.float32)
    y = resample.resample_linear(x, 16000, 8000)
    assert len(y) == 50
    np.testing.assert_allclose(y, np.arange(0, 100, 2), atol=1e-5)


# ---------- DSP ----------

def test_rms_db():
    assert float(dsp.rms_db(np.zeros(100, np.float32))) == -np.inf
    x = np.full(1000, 0.1, np.float32)
    assert abs(float(dsp.rms_db(x)) - (-20.0)) < 1e-3


def test_normalize_rms():
    x = _sine(amp=0.01)
    y = np.asarray(dsp.normalize_rms(x, target_db=-20.0))
    assert abs(float(dsp.rms_db(y)) - (-20.0)) < 0.1
    silent = np.zeros(1000, np.float32)
    np.testing.assert_array_equal(np.asarray(dsp.normalize_rms(silent)), silent)


def test_compress_reduces_loud_peaks():
    x = _sine(amp=0.9)
    y = np.asarray(dsp.compress(x, threshold_db=-20.0, ratio=4.0))
    assert np.max(np.abs(y)) < np.max(np.abs(x))
    # ratio <= 1 is a no-op
    np.testing.assert_array_equal(np.asarray(dsp.compress(x, ratio=1.0)), x)


def test_limit_enforces_ceiling():
    x = _sine(amp=1.0)
    y = np.asarray(dsp.limit(x, ceiling_db=-6.0))
    ceiling = 10 ** (-6.0 / 20.0)
    assert np.max(np.abs(y)) <= ceiling * 1.01
    quiet = _sine(amp=0.1)
    np.testing.assert_allclose(np.asarray(dsp.limit(quiet, ceiling_db=-1.0)),
                               quiet, atol=1e-6)


def test_preprocess_chain_jits():
    import jax
    x = _sine()
    f = jax.jit(lambda a: dsp.preprocess_chain(a, compress_enabled=True))
    y = np.asarray(f(x))
    assert y.shape == x.shape
    assert np.isfinite(y).all()


# ---------- validation ----------

def test_validate_ok():
    info = validation.validate_audio(_sine(secs=1.0))
    assert 0.99 < info.duration_secs < 1.01
    assert info.rms > 0


@pytest.mark.parametrize("samples,rate,msg", [
    (np.array([], np.float32), 16000, "empty"),
    (np.zeros(100, np.float32), 16000, "too short"),
    (np.zeros(16000 * 301, np.float32), 16000, "too long"),
    (np.zeros(16000, np.float32), 44100, "sample rate"),
])
def test_validate_rejects(samples, rate, msg):
    with pytest.raises(validation.AudioValidationError) as e:
        validation.validate_audio(samples, rate)
    assert msg.split()[0].lower() in str(e.value).lower()


def test_validate_rejects_nan_inf():
    x = _sine()
    x[5] = np.nan
    with pytest.raises(validation.AudioValidationError, match="NaN"):
        validation.validate_audio(x)
    x = _sine()
    x[7] = np.inf
    with pytest.raises(validation.AudioValidationError, match="infinite"):
        validation.validate_audio(x)
