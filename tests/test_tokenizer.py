"""Special-token layout, language tables, BPE fallback, formats."""

import numpy as np
import pytest

from openhush_tpu.text import formats
from openhush_tpu.text.tokenizer import (LANGUAGES, LANGUAGES_V3, BPE,
                                         SpecialTokens, WhisperTokenizer,
                                         _bytes_to_unicode)


def test_special_token_layout_v2():
    sp = SpecialTokens(99)
    assert sp.eot == 50257
    assert sp.sot == 50258
    assert sp.lang_token("en") == 50259
    assert sp.lang_token("su") == 50259 + 98
    assert sp.translate == 50358
    assert sp.transcribe == 50359
    assert sp.start_of_lm == 50360
    assert sp.start_of_prev == 50361
    assert sp.no_speech == 50362
    assert sp.no_timestamps == 50363
    assert sp.timestamp_begin == 50364
    assert sp.n_vocab == 51865


def test_special_token_layout_v3():
    sp = SpecialTokens(100)
    assert sp.lang_token("yue") == 50259 + 99
    assert sp.transcribe == 50360
    assert sp.timestamp_begin == 50365
    assert sp.n_vocab == 51866


def test_language_table_parity():
    """Order must match whisper.cpp lang ids (src/engine/whisper.rs:622-726)."""
    assert LANGUAGES[0] == "en"
    assert LANGUAGES[5] == "ko"
    assert LANGUAGES[29] == "no"
    assert LANGUAGES[93] == "haw"
    assert LANGUAGES[98] == "su"
    assert len(LANGUAGES) == 99
    assert LANGUAGES_V3[99] == "yue"
    sp = SpecialTokens(99)
    assert sp.lang_code(0) == "en"
    assert sp.lang_code(98) == "su"
    assert sp.lang_code(99) == "unknown"
    assert sp.lang_code(sp.lang_token("de")) == "de"


def test_timestamp_tokens():
    sp = SpecialTokens(99)
    assert sp.timestamp_seconds(sp.timestamp_begin) == 0.0
    assert sp.timestamp_seconds(sp.timestamp_begin + 1500) == 30.0
    assert sp.timestamp_token(1.0) == sp.timestamp_begin + 50
    assert sp.decode_special(sp.timestamp_begin + 50) == "<|1.00|>"
    assert sp.decode_special(sp.sot) == "<|startoftranscript|>"
    assert sp.decode_special(sp.lang_token("fr")) == "<|fr|>"


def test_sot_sequence():
    tok = WhisperTokenizer(99)
    sp = tok.special
    assert tok.sot_sequence("en", "transcribe") == \
        [sp.sot, sp.lang_token("en"), sp.transcribe]
    assert tok.sot_sequence("de", "translate") == \
        [sp.sot, sp.lang_token("de"), sp.translate]
    assert tok.sot_sequence(None) == [sp.sot]
    assert tok.sot_sequence("en", timestamps=False)[-1] == sp.no_timestamps


def test_fallback_roundtrip():
    tok = WhisperTokenizer(99)
    text = "Hello, wörld! 测试"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # Special tokens skipped / rendered.
    sp = tok.special
    seq = [sp.sot] + ids + [sp.eot]
    assert tok.decode(seq) == text
    assert "<|startoftranscript|>" in tok.decode_with_timestamps(seq)


def test_real_bpe_roundtrip():
    """A miniature GPT2-style vocab exercises the real BPE codepath."""
    b2u = _bytes_to_unicode()
    # vocab: all single bytes + merges for "he", "ll", "hell", "hello"
    vocab = {c: i for i, c in enumerate(sorted(b2u.values()))}
    n = len(vocab)
    merges = {}
    for i, (a, b) in enumerate([("h", "e"), ("l", "l"), ("he", "ll"),
                                ("hell", "o")]):
        merged = a + b
        vocab[merged] = n + i
        merges[(a, b)] = i
    bpe = BPE(vocab, merges)
    ids = bpe.encode("hello")
    assert len(ids) == 1 and ids[0] == vocab["hello"]
    assert bpe.decode(ids) == "hello"
    ids2 = bpe.encode("hello world")
    assert bpe.decode(ids2) == "hello world"


def test_tokenizer_from_files(tmp_path):
    import json
    b2u = _bytes_to_unicode()
    vocab = {c: i for i, c in enumerate(sorted(b2u.values()))}
    vp = tmp_path / "vocab.json"
    vp.write_text(json.dumps(vocab))
    mp = tmp_path / "merges.txt"
    mp.write_text("#version\n")
    tok = WhisperTokenizer.from_files(str(vp), str(mp), 99)
    assert tok.is_real_vocab
    assert tok.decode(tok.encode("abc")) == "abc"


def test_non_speech_tokens():
    tok = WhisperTokenizer(99)
    ns = tok.non_speech_tokens
    assert len(ns) > 0
    assert all(isinstance(t, int) for t in ns)
    assert ord("#") in ns  # byte fallback: '#' is a single token


# ---------- formats ----------

def test_format_timestamps():
    assert formats.format_timestamp(3723.4) == "01:02:03"
    assert formats.format_srt_timestamp(3723.456) == "01:02:03,456"
    assert formats.format_vtt_timestamp(59.999) == "00:00:59.999"


def test_format_srt_vtt_blocks():
    seg = formats.TranscribedSegment(1.0, 2.5, "Hello world")
    assert formats.format_srt(seg, 1) == \
        "1\n00:00:01,000 --> 00:00:02,500\nHello world\n"
    assert formats.format_vtt(seg) == \
        "00:00:01.000 --> 00:00:02.500\nHello world\n"
    seg_sp = formats.TranscribedSegment(0.0, 1.0, "Hi", speaker_id=2)
    assert "<v Speaker 2>Hi" in formats.format_srt(seg_sp, 3)
    assert formats.format_timestamped(seg_sp) == "[00:00:00] Speaker 2: Hi"


def test_render_full_documents():
    segs = [formats.TranscribedSegment(0.0, 1.0, "One"),
            formats.TranscribedSegment(1.0, 2.0, "Two")]
    assert formats.render(segs, "text") == "One\nTwo\n"
    srt = formats.render(segs, "srt")
    assert srt.startswith("1\n00:00:00,000")
    assert "\n2\n" in srt
    vtt = formats.render(segs, "vtt")
    assert vtt.startswith("WEBVTT\n\n")
    with pytest.raises(ValueError, match="Unknown format"):
        formats.render(segs, "nope")
    assert formats.parse_format("SubRip") == "srt"
    assert formats.parse_format("ts") == "timestamped"
