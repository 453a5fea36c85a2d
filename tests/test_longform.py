"""Long-form batched-across-files driver (runtime/longform.py): segment
parity with the one-shot engine seek loop, multi-file interleaving, and
server sizing. Parity target: the reference's sequential per-file loop
(/root/reference/src/main.rs:948-1051) — ours must produce the same
segments as our own conditioned=off engine path while batching files."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.runtime import engine as engine_mod
from openhush_tpu.runtime import longform
from openhush_tpu.runtime.engine import WhisperEngine
from openhush_tpu.runtime.server import EngineServer


# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

MAX_NEW = 24


@pytest.fixture(scope="module")
def eng():
    return WhisperEngine("test", allow_random_init=True, dtype="float32",
                         language="en")


def _audio(secs, seed):
    rng = np.random.default_rng(seed)
    n = int(16000 * secs)
    t = np.arange(n) / 16000
    x = 0.3 * np.sin(2 * np.pi * (200 + 20 * seed) * t) \
        * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def _pin_guards(monkeypatch):
    """T=0-only ladder + guards off on BOTH paths (random weights score
    avg_logprob ≈ -log V, which would send every window through the
    full fallback ladder)."""
    monkeypatch.setattr(engine_mod, "TEMPERATURES", (0.0,))
    monkeypatch.setattr(engine_mod, "LOGPROB_THRESHOLD", -1e9)
    monkeypatch.setattr(engine_mod, "NO_SPEECH_THRESHOLD", 2.0)


def _make_server(eng, n_slots):
    prompt_len = len(eng.tokenizer.sot_sequence("en", "transcribe",
                                                timestamps=True))
    return EngineServer(
        eng.cfg, eng.params, n_slots=n_slots, inner_steps=8,
        dtype=jnp.float32, tokenizer=eng.tokenizer,
        max_decode_len=prompt_len + MAX_NEW + 1,
        temperatures=(0.0,), logprob_threshold=-1e9,
        no_speech_threshold=2.0, max_admissions_per_turn=n_slots)


def test_longform_batched_matches_engine_seek_loop(eng, monkeypatch):
    """Two >30 s files through the batched driver must produce the SAME
    segments (start/end/text/tokens and seek behavior) as the one-shot
    engine with conditioning off — per-window greedy decode is
    token-exact between the batcher and the one-shot loop."""
    _pin_guards(monkeypatch)
    audios = [_audio(70.0, 1), _audio(45.0, 2)]

    refs = [eng.transcribe(a, language="en",
                           condition_on_previous_text=False,
                           max_new_tokens=MAX_NEW) for a in audios]

    server = _make_server(eng, n_slots=2)
    outs = longform.transcribe_files(server, audios, language="en")

    assert len(outs) == len(refs)
    for out, ref in zip(outs, refs):
        assert out.language == "en"
        assert len(out.segments) == len(ref.segments), (
            [s.text for s in out.segments], [s.text for s in ref.segments])
        for so, sr in zip(out.segments, ref.segments):
            assert so.tokens == sr.tokens
            assert so.text == sr.text
            assert so.start == pytest.approx(sr.start, abs=1e-6)
            assert so.end == pytest.approx(sr.end, abs=1e-6)
        assert out.text == ref.text


def test_longform_more_files_than_slots(eng, monkeypatch):
    """Files beyond the slot count queue and still complete, in order."""
    _pin_guards(monkeypatch)
    audios = [_audio(35.0, s) for s in range(5)]
    server = _make_server(eng, n_slots=2)
    outs = longform.transcribe_files(server, audios, language="en")
    assert len(outs) == 5
    for out in outs:
        assert out.duration_ms >= 0
        assert isinstance(out.text, str)
        for s in out.segments:
            # A window at offset t may carry timestamps up to t+30 s
            # (35 s file → last window offset <35 s → end <65 s).
            assert 0.0 <= s.start <= s.end <= 65.0


def test_longform_threaded_server(eng, monkeypatch):
    """The driver also works against a started (threaded) server."""
    _pin_guards(monkeypatch)
    audios = [_audio(35.0, 7), _audio(32.0, 8)]
    server = _make_server(eng, n_slots=2)
    server.start()
    try:
        outs = longform.transcribe_files(server, audios, language="en")
    finally:
        server.stop()
    assert len(outs) == 2
    assert all(isinstance(o.text, str) for o in outs)


def test_make_server_sizes_and_beam(eng):
    s = longform.make_server(eng.cfg, eng.params, eng.tokenizer,
                             n_files=3, max_new_tokens=MAX_NEW)
    assert s.n_slots == 3
    assert s.room_cap <= 64 - 1
    from openhush_tpu.runtime.beam_server import BeamEngineServer
    b = longform.make_server(eng.cfg, eng.params, eng.tokenizer,
                             n_files=2, beam_size=3,
                             max_new_tokens=MAX_NEW)
    assert isinstance(b, BeamEngineServer)
    assert b.beam_size == 3
