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


@pytest.mark.slow
def test_fuzz_beam_ancestry_vs_gather_oracle(fuzz_seed):
    """Random parent-switch sequences through the grouped beam step
    (model.decode_beam_step, ancestry MASK, cache never permuted) vs the
    gather oracle (physically reorder the cache rows by parent, then a
    per-row decode step). The ancestry mask is the tree's newest
    correctness-critical invariant; this drives it with parent choices
    beam search itself would never produce (repeats, collapses, swaps).
    Logits must agree to fp32 reduction-order noise; argmaxes must agree
    wherever the top-2 margin clears that noise."""
    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.text.tokenizer import WhisperTokenizer

    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(7))
    tok = WhisperTokenizer(cfg.n_langs)
    rng = np.random.default_rng(fuzz_seed + 777)
    G, K, T = 2, 3, 24
    L, H = cfg.n_text_layer, cfg.n_text_head
    HD = cfg.n_text_state
    GK = G * K

    mel = rng.standard_normal((G, 80, 3000)).astype(np.float32) * 0.5
    feats = whisper.encode(cfg, params, mel)
    xkv = whisper.compute_cross_kv_quant(cfg, params, feats)

    prompt = tok.sot_sequence("en", "transcribe", timestamps=False)
    P = len(prompt)

    # Prefill one row per group, tile K ways (beam_batcher._prefill_group
    # does the same); both formulations start from this identical cache.
    cache_g = whisper.init_kv_cache(cfg, GK, dtype=jnp.float32, max_len=T)
    ktile = np.zeros((L, GK, T, HD), np.float32)
    vtile = np.zeros_like(ktile)
    for g in range(G):
        row_xkv = whisper.QuantKVCache(
            *[jnp.asarray(np.asarray(getattr(xkv, f))[:, g:g + 1])
              for f in ("k", "k_scale", "v", "v_scale")])
        rc = whisper.init_kv_cache(cfg, 1, dtype=jnp.float32, max_len=T)
        _, rc = whisper.decode(cfg, params, jnp.asarray([prompt],
                                                        jnp.int32),
                               jnp.int32(0), rc, row_xkv)
        ktile[:, g * K:(g + 1) * K] = np.asarray(rc.k)
        vtile[:, g * K:(g + 1) * K] = np.asarray(rc.v)
    cache_g = whisper.KVCache(jnp.asarray(ktile), jnp.asarray(vtile))
    cache_o = whisper.KVCache(jnp.asarray(ktile), jnp.asarray(vtile))

    # Ancestry: each beam's own row holds the (identical) prompt.
    anc = (np.eye(K, dtype=bool)[None, :, :, None]
           & (np.arange(T)[None, None, None, :] < P))
    anc = np.broadcast_to(anc, (G, K, K, T)).copy()

    n_steps = 6
    for step in range(n_steps):
        pos = P + step
        parents = rng.integers(0, K, size=(G, K)).astype(np.int32)
        tokens = rng.integers(0, cfg.n_vocab, size=(G, K)).astype(np.int32)

        # Grouped: inherit parent's ancestry, step, set own bit.
        anc_att = np.take_along_axis(anc, parents[:, :, None, None],
                                     axis=1)
        lg, cache_g = whisper.decode_beam_step(
            cfg, params, jnp.asarray(tokens),
            jnp.full((G,), pos, jnp.int32), cache_g,
            jnp.asarray(anc_att.reshape(G, K, K * T)), xkv)
        own = (np.eye(K, dtype=bool)[None, :, :, None]
               & (np.arange(T)[None, None, None, :] == pos))
        anc = anc_att | own

        # Oracle: physically gather rows by flat parent, per-row decode
        # (the K-tiled cross-KV fallback formulation).
        flat_parent = (parents + np.arange(G)[:, None] * K).reshape(GK)
        cache_o = whisper.KVCache(cache_o.k[:, flat_parent],
                                  cache_o.v[:, flat_parent])
        rep = lambda a: jnp.repeat(a, K, axis=1)
        xkv_t = whisper.QuantKVCache(rep(xkv.k), rep(xkv.k_scale),
                                     rep(xkv.v), rep(xkv.v_scale))
        lo, cache_o = whisper.decode(
            cfg, params, jnp.asarray(tokens.reshape(GK, 1)),
            jnp.full((GK,), pos, jnp.int32), cache_o, xkv_t)

        a = np.asarray(lg, np.float32).reshape(GK, -1)
        b = np.asarray(lo, np.float32)[:, -1]
        valid = np.isfinite(a) & np.isfinite(b)
        scale = np.abs(b[valid]).max()
        noise = 5e-5 * scale
        assert np.abs(a[valid] - b[valid]).max() < noise, \
            f"step {step}: grouped/gather logit divergence"
        for r in range(GK):
            av, bv = a[r], b[r]
            top2 = np.partition(bv[np.isfinite(bv)], -2)[-2:]
            if top2[1] - top2[0] > 2 * noise:
                assert int(av.argmax()) == int(bv.argmax()), \
                    f"step {step} row {r}: argmax flipped"


@pytest.mark.slow
def test_fuzz_beam_batcher_admit_evict_interleavings(fuzz_seed):
    """Random admit / step / harvest / release interleavings through the
    beam batcher: every window's result must be IDENTICAL to an isolated
    single-group run of the same window (the per-group B=1 semantics
    contract), no matter what its neighbors do — plus the structural
    ancestry invariant (every live beam's mask selects exactly
    prompt_len + step positions: one ancestor row bit per written
    position, never more, never fewer)."""
    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import decoding, model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.runtime import beam_batcher
    from openhush_tpu.text.tokenizer import WhisperTokenizer

    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(7))
    tok = WhisperTokenizer(cfg.n_langs)
    rng = np.random.default_rng(fuzz_seed + 999)
    G, K = 2, 2
    max_new = 10
    blank = int(tok.encode(" ")[0])
    prompt = tok.sot_sequence("en", "transcribe", timestamps=False)
    P = len(prompt)
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions()))

    def xkv_for(seed):
        r2 = np.random.default_rng(seed)
        mel = r2.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
        feats = whisper.encode(cfg, params, mel)
        return whisper.compute_cross_kv_quant(cfg, params, feats)

    def harvest(state, g):
        fetch = jax.device_get(
            (state.tokens, state.alive_lp, state.alive_len,
             state.fin_scores, state.fin_tokens, state.fin_lens,
             state.temperature, state.done_row))
        row, length, _ = beam_batcher.best_hypothesis(
            *[f[g] for f in fetch])
        return [int(t) for t in row[P:P + length]
                if t != tok.special.eot]

    # Isolated references: each window run alone to completion.
    windows = [xkv_for(1000 + i) for i in range(3)]
    expected = []
    for xkv in windows:
        st = beam_batcher.init_state(cfg, 1, K, dtype=jnp.float32)
        st = beam_batcher.admit(
            cfg, params, st, jnp.int32(0), xkv,
            jnp.asarray([prompt], jnp.int32), jnp.asarray(False),
            prompt_len=P, max_new=jnp.int32(max_new))
        for _ in range(40):
            st = beam_batcher.step(cfg, params, st, suppress,
                                   inner_steps=2, blank_token=blank)
            if bool(np.asarray(st.finished[0])):
                break
        expected.append(harvest(st, 0))

    # Random interleaving over G groups; every admitted window must
    # reproduce its isolated result at harvest.
    state = beam_batcher.init_state(cfg, G, K, dtype=jnp.float32)
    occupant = {}          # group → window index
    next_win = 0
    checked = 0
    for _ in range(60):
        act = rng.integers(0, 3)
        free = [g for g in range(G) if g not in occupant]
        if act == 0 and free and next_win < len(expected) * 2:
            g = int(rng.choice(free))
            w = next_win % len(windows)
            state = beam_batcher.admit(
                cfg, params, state, jnp.int32(g), windows[w],
                jnp.asarray([prompt], jnp.int32), jnp.asarray(False),
                prompt_len=P, max_new=jnp.int32(max_new))
            occupant[g] = w
            next_win += 1
        elif act == 1 and occupant:
            state = beam_batcher.step(
                cfg, params, state, suppress,
                inner_steps=int(rng.integers(1, 4)), blank_token=blank)
            # Ancestry invariant on live beam-mode groups: each beam
            # sees exactly P + step written positions.
            anc, stepv, active, fin = jax.device_get(
                (state.anc, state.step, state.active, state.finished))
            for g in list(occupant):
                if active[g] and not fin[g]:
                    want = P + int(stepv[g])
                    got = anc[g].reshape(K, -1).sum(axis=1)
                    assert (got == want).all(), \
                        f"group {g}: ancestry count {got} != {want}"
        else:
            fin = np.asarray(state.finished)
            for g in list(occupant):
                if fin[g]:
                    got = harvest(state, g)
                    assert got == expected[occupant[g]], \
                        f"group {g} diverged from isolated run"
                    checked += 1
                    mask = np.zeros(G, bool)
                    mask[g] = True
                    state = beam_batcher.release(state,
                                                 jnp.asarray(mask))
                    del occupant[g]
    # Drain: finish whatever is still in flight and check it too.
    for _ in range(60):
        if not occupant:
            break
        state = beam_batcher.step(cfg, params, state, suppress,
                                  inner_steps=2, blank_token=blank)
        fin = np.asarray(state.finished)
        for g in list(occupant):
            if fin[g]:
                assert harvest(state, g) == expected[occupant[g]]
                checked += 1
                mask = np.zeros(G, bool)
                mask[g] = True
                state = beam_batcher.release(state, jnp.asarray(mask))
                del occupant[g]
    assert checked >= 3, "interleaving never exercised a harvest"
