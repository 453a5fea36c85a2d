"""Engine long-form transcription loop on random weights ("test" config) —
the fake-backend strategy: full pipeline behavior without pretrained models
(SURVEY.md §4, mirroring src/queue/worker.rs:502-538)."""

import numpy as np
import pytest

from openhush_tpu.runtime.engine import (WhisperEngine, compression_ratio,
                                         TranscriptionResult)
from openhush_tpu.runtime.validation import AudioValidationError



# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def engine():
    return WhisperEngine("test", allow_random_init=True, dtype="float32",
                         language="en")


def _speechish(secs=3.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * secs)
    t = np.arange(n) / 16000
    x = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_transcribe_returns_result(engine):
    res = engine.transcribe(_speechish(2.0))
    assert isinstance(res, TranscriptionResult)
    assert res.language in engine.tokenizer.special.languages
    assert isinstance(res.text, str)
    assert res.duration_ms >= 0
    for s in res.segments:
        assert 0.0 <= s.start <= s.end <= 35.0
        assert np.isfinite(s.avg_logprob)


def test_transcribe_long_audio_advances(engine):
    """>30 s audio must be consumed by the seek loop without stalling."""
    res = engine.transcribe(_speechish(35.0), language="en")
    assert isinstance(res, TranscriptionResult)
    # Offsets stay within audio length + one 30 s window of timestamp slack.
    assert all(0.0 <= s.start <= 35.0 + 30.0 for s in res.segments)
    assert all(s.end >= s.start for s in res.segments)


def test_transcribe_rejects_bad_audio(engine):
    with pytest.raises(AudioValidationError):
        engine.transcribe(np.zeros(10, np.float32))  # too short
    bad = _speechish(1.0)
    bad[0] = np.nan
    with pytest.raises(AudioValidationError):
        engine.transcribe(bad)


def test_translate_flag(engine):
    res = engine.transcribe(_speechish(1.5), language="de", translate=True)
    assert res.language == "de"


def test_compression_ratio():
    assert compression_ratio("") == 0.0
    low = compression_ratio("The quick brown fox jumps over the lazy dog.")
    high = compression_ratio("ha " * 200)
    assert high > low > 0.5


def test_missing_model_error():
    with pytest.raises(FileNotFoundError, match="Model not found"):
        WhisperEngine("tiny", model_path="/nonexistent/tiny.npz")


def test_benchmark_chunk_interval(engine):
    interval = engine.benchmark_chunk_interval()
    assert 0.5 <= interval <= 20.0


def test_transcribe_with_beam(engine):
    res = engine.transcribe(_speechish(1.5), language="en", beam_size=2)
    assert isinstance(res, TranscriptionResult)
    assert all(np.isfinite(s.avg_logprob) for s in res.segments)


def test_engine_bf16_quant_path():
    """The production default (bf16 + int8 cross-KV) end to end on CPU."""
    eng = WhisperEngine("test", allow_random_init=True, dtype="bfloat16",
                        language="en")
    res = eng.transcribe(_speechish(1.2), language="en")
    assert isinstance(res, TranscriptionResult)
    assert all(np.isfinite(s.avg_logprob) for s in res.segments)


def test_engine_int8_weights_path():
    eng = WhisperEngine("test", allow_random_init=True, dtype="bfloat16",
                        language="en", quantize_weights=True)
    assert isinstance(eng.params["decoder"]["layers"]["q_w"], dict)
    res = eng.transcribe(_speechish(1.0), language="en")
    assert isinstance(res, TranscriptionResult)


def test_int8_weights_env_zero_is_hard_off(tmp_path, monkeypatch):
    """OPENHUSH_INT8_WEIGHTS=0 is the documented debugging kill-switch:
    it must force bf16 weights even when the checkpoint gate's
    int8_rung.ok marker exists."""
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path))
    monkeypatch.delenv("OPENHUSH_INT8_RUNG", raising=False)
    (tmp_path / "int8_rung.ok").touch()

    monkeypatch.setenv("OPENHUSH_INT8_WEIGHTS", "0")
    eng = WhisperEngine("test", allow_random_init=True, dtype="bfloat16",
                        language="en")
    assert not isinstance(eng.params["decoder"]["layers"]["q_w"], dict)

    # Unset, the marker alone flips quantization on.
    monkeypatch.delenv("OPENHUSH_INT8_WEIGHTS")
    eng = WhisperEngine("test", allow_random_init=True, dtype="bfloat16",
                        language="en")
    assert isinstance(eng.params["decoder"]["layers"]["q_w"], dict)
