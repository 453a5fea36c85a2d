"""Randomized property tests on the pure pieces — the pytest analogue of
the reference's cargo-fuzz targets (fuzz/fuzz_targets/: audio_processing,
audio_validation, config_parse, ring_buffer interleavings; SURVEY.md §4)."""

import numpy as np
import pytest

N_ITER = 60


def test_fuzz_audio_processing_chain():
    """Random sample buffers × random DSP op sequences must stay finite
    and shape-preserving (parity: audio_processing fuzz target)."""
    from openhush_tpu.ops import dsp
    rng = np.random.default_rng(0)
    for i in range(N_ITER // 3):
        n = int(rng.integers(1, 50_000))
        scale = float(10 ** rng.uniform(-6, 2))
        x = (scale * rng.standard_normal(n)).astype(np.float32)
        ops = rng.integers(0, 4, size=rng.integers(1, 5))
        y = x
        for op in ops:
            if op == 0:
                y = np.asarray(dsp.normalize_rms(
                    y, float(rng.uniform(-60, 0))))
            elif op == 1:
                y = np.asarray(dsp.compress(
                    y, float(rng.uniform(-40, 0)),
                    float(rng.uniform(1.1, 20)),
                    float(rng.uniform(0.1, 100)),
                    float(rng.uniform(1, 500))))
            elif op == 2:
                y = np.asarray(dsp.limit(
                    y, float(rng.uniform(-20, 0)),
                    float(rng.uniform(1, 500))))
            else:
                y = np.asarray(dsp.apply_gain(
                    y, float(rng.uniform(-30, 30))))
            assert y.shape == x.shape
            assert np.isfinite(y).all(), f"non-finite after op {op}"


def test_fuzz_audio_validation():
    """Edge-case buffers at the device-dispatch guard (parity:
    audio_validation fuzz target)."""
    from openhush_tpu.runtime.validation import (AudioValidationError,
                                                 validate_audio)
    rng = np.random.default_rng(1)
    specials = [np.nan, np.inf, -np.inf, 0.0, 1e38, -1e38, 1e-38]
    for _ in range(N_ITER):
        n = int(rng.integers(0, 20_000))
        x = rng.standard_normal(n).astype(np.float32)
        if n and rng.random() < 0.5:
            for _ in range(int(rng.integers(1, 4))):
                x[rng.integers(0, n)] = specials[
                    rng.integers(0, len(specials))]
        rate = int(rng.choice([16000, 8000, 44100, 0, 1]))
        try:
            info = validate_audio(x, rate)
            # If accepted, the info must be internally consistent.
            assert info.sample_count == n
            assert np.isfinite(info.rms)
        except AudioValidationError:
            pass  # rejection is always acceptable
        except ZeroDivisionError:
            pytest.fail("validation crashed on rate=0")


def test_fuzz_config_parse(tmp_path):
    """Malformed TOML must never crash Config loading (parity:
    config_parse fuzz target)."""
    from openhush_tpu.utils.config import Config
    rng = np.random.default_rng(2)
    corpus = [
        b"", b"[", b"]", b"[transcription", b"key=", b"= value",
        b"[transcription]\nmodel = 5\n",
        b"[transcription]\nmodel = \"tiny\"\nmodel = \"base\"\n",
        b"\x00\x01\x02", "[transcription]\nmodel = \"é\"\n".encode(),
        b"[a]\n" * 1000,
        b"[transcription]\npreset = [1,2,3]\n",
    ]
    for i, raw in enumerate(corpus):
        p = tmp_path / f"c{i}.toml"
        p.write_bytes(raw)
        try:
            cfg = Config.load_or_default(str(p))
            cfg.validate()
        except Exception as e:  # noqa: BLE001
            # tomllib decode errors are fine; crashes elsewhere are not.
            import tomllib
            assert isinstance(e, (tomllib.TOMLDecodeError,
                                  UnicodeDecodeError, TypeError)), \
                f"unexpected {type(e).__name__} on corpus[{i}]: {e}"
    # Random byte soup.
    for _ in range(20):
        raw = bytes(rng.integers(0, 256, size=rng.integers(0, 200),
                                 dtype=np.uint8))
        p = tmp_path / "r.toml"
        p.write_bytes(raw)
        try:
            Config.load_or_default(str(p))
        except Exception as e:  # noqa: BLE001
            import tomllib
            assert isinstance(e, (tomllib.TOMLDecodeError,
                                  UnicodeDecodeError, TypeError))


def test_fuzz_ring_buffer_interleavings():
    """Random push/mark/extract interleavings: any extract of a span that
    was never overwritten must return exactly what was pushed (parity:
    ring_buffer fuzz target)."""
    from openhush_tpu.runtime.ring_buffer import RingBuffer
    rng = np.random.default_rng(3)
    for trial in range(6):
        rb = RingBuffer(duration_secs=0.02,
                        prefer_native=bool(trial % 2))
        cap = rb.capacity
        shadow = []          # full logical stream
        marks = []
        for _ in range(300):
            r = rng.random()
            if r < 0.6:
                n = int(rng.integers(1, 120))
                data = rng.standard_normal(n).astype(np.float32)
                rb.push(data)
                shadow.extend(data.tolist())
            elif r < 0.8:
                marks.append(rb.mark())
            elif marks:
                m = marks[rng.integers(0, len(marks))]
                now = rb.current_position()
                out = rb.extract_range(m.position, now)
                span = now - m.position
                if span <= cap:   # not overwritten
                    expect = np.asarray(shadow[m.position:now],
                                        np.float32)
                    np.testing.assert_array_equal(out, expect)
                else:
                    assert len(out) == cap


def test_fuzz_tokenizer_roundtrip():
    """Random unicode → encode → decode must round-trip (byte fallback)."""
    from openhush_tpu.text.tokenizer import WhisperTokenizer
    tok = WhisperTokenizer(99)
    rng = np.random.default_rng(4)
    for _ in range(N_ITER):
        n = int(rng.integers(0, 50))
        cps = rng.integers(1, 0x2FFF, size=n)
        s = "".join(chr(c) for c in cps if not (0xD800 <= c <= 0xDFFF))
        assert tok.decode(tok.encode(s)) == s


def test_fuzz_sentence_buffer_never_loses_text():
    """All non-whitespace input eventually comes out (add* + flush)."""
    from openhush_tpu.text.sentence_buffer import SentenceBuffer
    rng = np.random.default_rng(5)
    words = ["hello", "world.", "what?", "ok!", "…", "a" * 300, '"quote."']
    for _ in range(20):
        buf = SentenceBuffer(max_buffer=128)
        fed, got = [], []
        for _ in range(int(rng.integers(1, 30))):
            chunk = " ".join(words[rng.integers(0, len(words))]
                             for _ in range(rng.integers(1, 4))) + " "
            fed.append(chunk)
            got.extend(buf.add(chunk))
        rest = buf.flush()
        if rest:
            got.append(rest)
        assert "".join("".join(fed).split()) == \
            "".join("".join(got).split())
