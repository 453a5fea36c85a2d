"""Wake word pipeline + diarization clustering + recording session tests."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models import diarization, wakeword
from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.runtime.recording import (RecordingConfig,
                                            RecordingSession)
from openhush_tpu.runtime.server import EngineServer
from openhush_tpu.text.tokenizer import WhisperTokenizer


# ---------- wake word ----------


# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

def _chunks(secs, seed=0, amp=0.3):
    rng = np.random.default_rng(seed)
    n = int(16000 * secs)
    audio = (amp * rng.standard_normal(n)).astype(np.float32)
    return [audio[i:i + wakeword.CHUNK_SAMPLES]
            for i in range(0, n - wakeword.CHUNK_SAMPLES,
                           wakeword.CHUNK_SAMPLES)]


def test_wakeword_pipeline_warms_then_scores():
    det = wakeword.WakeWordDetector()
    scores = [det.process(c) for c in _chunks(3.0)]
    # mel window (76 frames) needs 10 chunks, then 16 embeddings.
    warm = [s for s in scores if s is not None]
    assert len(warm) > 0
    assert all(0.0 <= s <= 1.0 for s in warm)
    # Pipeline latency: first score after (76/8 + 16 - 1) chunks ≈ 25.
    first_idx = scores.index(warm[0])
    assert 20 <= first_idx <= 30


def test_wakeword_refractory():
    det = wakeword.WakeWordDetector(
        wakeword.WakeWordConfig(threshold=0.0, refractory_secs=2.0))
    for c in _chunks(3.0):
        s = det.process(c)
    assert det.detected(0.9)           # first trigger
    assert not det.detected(0.9)       # suppressed (refractory)
    det._chunks_since_trigger = 10 ** 9
    assert det.detected(0.9)
    assert not det.detected(None)
    assert not det.detected(-1.0)


def test_wakeword_save_load(tmp_path):
    det = wakeword.WakeWordDetector()
    p = str(tmp_path / "ww.npz")
    det.save(p)
    det2 = wakeword.WakeWordDetector.load(p)
    chunks = _chunks(3.0, seed=5)
    s1 = [det.process(c) for c in chunks]
    det.reset()
    s2 = [det2.process(c) for c in chunks]
    assert s1[-1] == pytest.approx(s2[-1], abs=1e-6)


def test_wakeword_mel_normalization():
    tail = jnp.zeros(240)
    loud = jnp.ones(1280) * 0.5
    mel = np.asarray(wakeword.melspectrogram_chunk(loud, tail))
    assert mel.shape == (8, 32)
    assert np.isfinite(mel).all()


# ---------- diarization ----------

def test_clusterer_separates_distinct_embeddings():
    c = diarization.EmbeddingClusterer(
        diarization.DiarizationConfig(similarity_threshold=0.7))
    rng = np.random.default_rng(0)
    a = rng.standard_normal(192)
    b = rng.standard_normal(192)
    assert c.assign(a) == 0
    assert c.assign(a + 0.01 * rng.standard_normal(192)) == 0
    assert c.assign(b) == 1
    assert c.assign(b + 0.01 * rng.standard_normal(192)) == 1
    assert c.n_speakers == 2


def test_clusterer_max_speaker_cap():
    c = diarization.EmbeddingClusterer(
        diarization.DiarizationConfig(similarity_threshold=0.99,
                                      max_speakers=2))
    rng = np.random.default_rng(1)
    ids = [c.assign(rng.standard_normal(192)) for _ in range(6)]
    assert c.n_speakers <= 2
    assert set(ids) <= {0, 1}


def test_speaker_embedding_deterministic_and_normalized():
    params = diarization.init_embedder_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    eng = diarization.DiarizationEngine(params=params)
    e1, e2 = eng.embed(audio), eng.embed(audio)
    np.testing.assert_allclose(e1, e2, atol=1e-6)
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-4
    # Different audio → different embedding.
    other = eng.embed((0.2 * rng.standard_normal(16000)).astype(np.float32))
    assert np.abs(e1 - other).max() > 1e-4


def test_diarize_chunk_skips_silence():
    eng = diarization.DiarizationEngine()
    silent = np.zeros(16000 * 3, np.float32)
    assert eng.diarize_chunk(silent) == []
    rng = np.random.default_rng(3)
    speech = (0.3 * rng.standard_normal(16000 * 3)).astype(np.float32)
    segs = eng.diarize_chunk(speech, offset_secs=10.0)
    assert len(segs) >= 1
    assert all(s.start_secs >= 10.0 for s in segs)


# ---------- recording session ----------

class FakeServer:
    """Canned-text engine server: isolates session logic from model
    weights (the reference's fake-backend pattern)."""

    def __init__(self):
        import queue
        self._q = queue.Queue()
        self.submitted = []

    def open_session(self):
        return 1

    def submit_window(self, sid, audio, window_id=0, **kw):
        from openhush_tpu.runtime.server import WindowResult
        self.submitted.append((window_id, len(audio)))
        self._q.put(WindowResult(
            session_id=sid, window_id=window_id, tokens=[1],
            text=f"chunk at {window_id}", avg_logprob=-0.1,
            no_speech_prob=0.01, first_token_latency=0.05, latency=0.1))

    def poll(self, sid, timeout=None):
        import queue
        try:
            return self._q.get_nowait()
        except queue.Empty:
            return None


def test_recording_session_file_source(tmp_path):
    from openhush_tpu.audio.capture import FileSource
    rng = np.random.default_rng(4)
    audio = (0.2 * rng.standard_normal(16000 * 12)).astype(np.float32)
    out = io.StringIO()
    outfile = str(tmp_path / "rec.srt")
    server = FakeServer()
    session = RecordingSession(
        RecordingConfig(source="file", output_file=outfile,
                        output_format="srt", live_mode=True),
        server, FileSource(audio, realtime=False), stdout=out)
    session.run(max_duration=60)
    # 12 s at 5 s chunks (0.5 s overlap stride 4.5 s) → 2 full chunks +
    # final remainder flush.
    assert len(session.segments) >= 3
    # Chunks overlap: consecutive submissions 4.5 s apart.
    offsets = sorted(w for w, _ in server.submitted)
    assert offsets[1] - offsets[0] == 4500
    content = open(outfile).read()
    assert "-->" in content and "chunk at" in content
    live = out.getvalue()
    assert "chunk at 0" in live
    starts = [s.start_secs for s in session.segments]
    assert starts == sorted(starts)


def test_recording_session_real_engine_smoke(tmp_path):
    """Full path with the real engine server (random weights): windows
    complete even if decoded text is empty."""
    from openhush_tpu.audio.capture import FileSource
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0))
    server = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                          dtype=jnp.float32,
                          tokenizer=WhisperTokenizer(cfg.n_langs))
    rng = np.random.default_rng(5)
    audio = (0.2 * rng.standard_normal(16000 * 6)).astype(np.float32)
    session = RecordingSession(
        RecordingConfig(source="file", output_format="text",
                        live_mode=False),
        server, FileSource(audio, realtime=False), stdout=io.StringIO())
    session.run(max_duration=300)   # generous: parallel CI load can
    # stretch the CPU compile+drain well past 2 minutes
    assert session._pending == 0       # everything drained
