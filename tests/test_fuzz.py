"""Randomized property tests on the pure pieces — the pytest analogue of
the reference's cargo-fuzz targets (fuzz/fuzz_targets/: audio_processing,
audio_validation, config_parse, ring_buffer interleavings; SURVEY.md §4)."""

import os

import numpy as np
import pytest

N_ITER = 60

# Randomized nightly lane (parity role: the reference's open-ended
# libFuzzer runs, fuzz/Cargo.toml): the PR lane runs ONE fixed-seed round
# (deterministic); nightly CI sets OPENHUSH_FUZZ_SEED=$(epoch) and
# OPENHUSH_FUZZ_ROUNDS=N so every target sweeps N rotating seeds.
_BASE_SEED = int(os.environ.get("OPENHUSH_FUZZ_SEED", "0"))
_ROUNDS = int(os.environ.get("OPENHUSH_FUZZ_ROUNDS", "1"))


@pytest.fixture(params=range(_ROUNDS))
def fuzz_seed(request):
    return _BASE_SEED + request.param * 1000003


def test_fuzz_audio_processing_chain(fuzz_seed):
    """Random sample buffers × random DSP op sequences must stay finite
    and shape-preserving (parity: audio_processing fuzz target)."""
    from openhush_tpu.ops import dsp
    rng = np.random.default_rng(fuzz_seed)
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


def test_fuzz_audio_validation(fuzz_seed):
    """Edge-case buffers at the device-dispatch guard (parity:
    audio_validation fuzz target)."""
    from openhush_tpu.runtime.validation import (AudioValidationError,
                                                 validate_audio)
    rng = np.random.default_rng(fuzz_seed + 1)
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


def test_fuzz_config_parse(tmp_path, fuzz_seed):
    """Malformed TOML must never crash Config loading (parity:
    config_parse fuzz target)."""
    from openhush_tpu.utils.config import Config
    rng = np.random.default_rng(fuzz_seed + 2)
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


def test_fuzz_ring_buffer_interleavings(fuzz_seed):
    """Random push/mark/extract interleavings: any extract of a span that
    was never overwritten must return exactly what was pushed (parity:
    ring_buffer fuzz target)."""
    from openhush_tpu.runtime.ring_buffer import RingBuffer
    rng = np.random.default_rng(fuzz_seed + 3)
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


def test_fuzz_tokenizer_roundtrip(fuzz_seed):
    """Random unicode → encode → decode must round-trip (byte fallback)."""
    from openhush_tpu.text.tokenizer import WhisperTokenizer
    tok = WhisperTokenizer(99)
    rng = np.random.default_rng(fuzz_seed + 4)
    for _ in range(N_ITER):
        n = int(rng.integers(0, 50))
        cps = rng.integers(1, 0x2FFF, size=n)
        s = "".join(chr(c) for c in cps if not (0xD800 <= c <= 0xDFFF))
        assert tok.decode(tok.encode(s)) == s


def test_fuzz_sentence_buffer_never_loses_text(fuzz_seed):
    """All non-whitespace input eventually comes out (add* + flush)."""
    from openhush_tpu.text.sentence_buffer import SentenceBuffer
    rng = np.random.default_rng(fuzz_seed + 5)
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


def test_fuzz_dbus_marshal_roundtrip(fuzz_seed):
    """Random values for random signatures must marshal → unmarshal
    identically (the container marshaller carries SNI/dbusmenu payloads;
    mirrors the reference's fuzz posture on its wire surfaces)."""
    import random

    from openhush_tpu.utils import dbus as wire

    rng = random.Random(fuzz_seed + 1234)
    basic = "ybnqiuxtdsog"

    def rand_sig(depth=0):
        roll = rng.random()
        if depth >= 3 or roll < 0.55:
            return rng.choice(basic)
        if roll < 0.7:
            return "a" + rand_sig(depth + 1)
        if roll < 0.8:
            return "a{s" + rand_sig(depth + 1) + "}"
        if roll < 0.9:
            return "(" + "".join(rand_sig(depth + 1)
                                 for _ in range(rng.randint(1, 3))) + ")"
        return "v"

    def rand_val(sig):
        t = sig[0]
        if t == "y":
            return rng.randint(0, 255)
        if t == "b":
            return rng.random() < 0.5
        if t == "n":
            return rng.randint(-2 ** 15, 2 ** 15 - 1)
        if t == "q":
            return rng.randint(0, 2 ** 16 - 1)
        if t in "iu":
            return rng.randint(0, 2 ** 31 - 1) if t == "u" \
                else rng.randint(-2 ** 31, 2 ** 31 - 1)
        if t in "xt":
            return rng.randint(0, 2 ** 62)
        if t == "d":
            return rng.uniform(-1e9, 1e9)
        if t in "sog":
            alpha = "abXY09_é" if t == "s" else "abXY09_"
            s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
            return "/" + s.replace("é", "") if t == "o" else s
        if t == "v":
            inner = rng.choice(basic)
            return (inner, rand_val(inner))
        if t == "a" and sig[1] == "{":
            ksig, vsig = wire.split_signature(sig[2:-1])
            return {rand_val(ksig): rand_val(vsig)
                    for _ in range(rng.randint(0, 4))}
        if t == "a":
            elem = sig[1:]
            return [rand_val(elem) for _ in range(rng.randint(0, 4))]
        if t == "(":
            return tuple(rand_val(m)
                         for m in wire.split_signature(sig[1:-1]))
        raise AssertionError(sig)

    def norm_in(sig, v):
        # Variants unwrap to their value on the way out; doubles
        # roundtrip bit-exactly through struct '<d'.
        t = sig[0]
        if t == "v":
            return norm_in(v[0], v[1])
        if t == "a" and sig[1] == "{":
            ksig, vsig = wire.split_signature(sig[2:-1])
            return {k: norm_in(vsig, val) for k, val in v.items()}
        if t == "a":
            return [norm_in(sig[1:], x) for x in v]
        if t == "(":
            return tuple(norm_in(m, x) for m, x in
                         zip(wire.split_signature(sig[1:-1]), v))
        return v

    def norm_out(sig, v):
        # Output side: variants are ALREADY plain values.
        t = sig[0]
        if t == "v":
            return v
        if t == "a" and sig[1] == "{":
            ksig, vsig = wire.split_signature(sig[2:-1])
            return {k: norm_out(vsig, val) for k, val in v.items()}
        if t == "a":
            return [norm_out(sig[1:], x) for x in v]
        if t == "(":
            return tuple(norm_out(m, x) for m, x in
                         zip(wire.split_signature(sig[1:-1]), v))
        return v

    for trial in range(300):
        sigs = [rand_sig() for _ in range(rng.randint(1, 4))]
        vals = [rand_val(s) for s in sigs]
        m = wire.Marshaller()
        for s, v in zip(sigs, vals):
            m.put(s, v)
        u = wire.Unmarshaller(bytes(m.buf))
        for s, v in zip(sigs, vals):
            got = u.get(s)
            assert norm_out(s, got) == norm_in(s, v), (trial, s, v, got)


def test_fuzz_host_command_quoting(fuzz_seed):
    """osa_quote/ps_quote must keep arbitrary text inside ONE literal:
    no quote/backslash sequence may terminate the string early (shell
    word count stays 1 when the plan is tokenized naively)."""
    import random

    from openhush_tpu.utils import platform_hosts as ph

    rng = random.Random(fuzz_seed + 77)
    alphabet = '"\'\\`$(){};\n\t aZ0€漢'
    for _ in range(200):
        s = "".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 40)))
        osa = ph.osa_quote(s)
        # Balanced AppleScript literal: unescaped quotes only at ends.
        assert osa[0] == osa[-1] == '"'
        body = osa[1:-1]
        i, unescaped = 0, 0
        while i < len(body):
            if body[i] == "\\":
                i += 2
                continue
            if body[i] == '"':
                unescaped += 1
            i += 1
        assert unescaped == 0, (s, osa)
        ps = ph.ps_quote(s)
        assert ps[0] == ps[-1] == "'"
        assert "''" in ps or "'" not in ps[1:-1]
        # Round-trip: PowerShell '' unescapes to '.
        assert ps[1:-1].replace("''", "'") == s
        # Argv plans never embed the raw text outside the literal.
        argv = ph.windows_notify_argv("T", s)
        assert argv[0] == "powershell"


def test_fuzz_stream_resampler(fuzz_seed):
    """Random rates/block sizes: output finite, length tracks the rate
    ratio, streaming == one-shot regardless of block boundaries."""
    import numpy as np

    from openhush_tpu.audio.system_audio_hosts import StreamResampler

    rng = np.random.default_rng(fuzz_seed + 88)
    for _ in range(10):
        rate_in = int(rng.integers(8_000, 96_000))
        rate_out = int(rng.integers(8_000, 48_000))
        n = int(rng.integers(1_000, 30_000))
        x = rng.standard_normal(n).astype(np.float32)
        whole = StreamResampler(rate_in, rate_out).process(x)
        assert np.isfinite(whole).all()
        expect = n * rate_out / rate_in
        # The tail holds back up to ~1 input sample, i.e. rate_out/
        # rate_in output samples when upsampling.
        assert abs(len(whole) - expect) <= 3 + rate_out / rate_in
        sr = StreamResampler(rate_in, rate_out)
        chunks, pos = [], 0
        while pos < n:
            size = int(rng.integers(1, 4_000))
            chunks.append(sr.process(x[pos:pos + size]))
            pos += size
        got = np.concatenate(chunks) if chunks else np.zeros(0)
        m = min(len(got), len(whole))
        np.testing.assert_allclose(got[:m], whole[:m], atol=1e-5)


def test_fuzz_chord_poller_state_machine(fuzz_seed):
    """Random key-state walks: press/release events strictly alternate,
    release only after press, and a press implies key+modifiers were
    down at that tick."""
    import random

    from openhush_tpu.runtime.hotkey_hosts import ChordPoller

    rng = random.Random(fuzz_seed + 99)
    keys = [1, 2, 3, 4]
    down: set = set()
    events = []
    poller = ChordPoller(1, ((2, 3),), lambda c: c in down,
                         lambda: events.append(("press", 1 in down,
                                                bool(down & {2, 3}))),
                         lambda: events.append(("release",)))
    for _ in range(500):
        k = rng.choice(keys)
        if k in down and rng.random() < 0.5:
            down.discard(k)
        else:
            down.add(k)
        poller.tick()
    kinds = [e[0] for e in events]
    for a, b in zip(kinds, kinds[1:]):
        assert a != b                        # strict alternation
    if kinds:
        assert kinds[0] == "press"
    for e in events:
        if e[0] == "press":
            assert e[1] and e[2]             # chord truly held
