"""Decode-loop invariants on random weights: timestamp grammar, suppression,
language detection, determinism. (Token-level parity with pretrained
checkpoints is exercised when a converted model is present; these tests
validate the *rules*, which is what whisper.cpp also enforces structurally.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.text.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    feats = whisper.encode(cfg, params, mel)
    xkv = whisper.compute_cross_kv(cfg, params, feats)
    tok = WhisperTokenizer(cfg.n_langs)
    return cfg, params, xkv, tok


def _run(setup, **kw):
    cfg, params, xkv, tok = setup
    opts = decoding.DecodingOptions(**kw)
    res = decoding.decode_greedy(cfg, params, xkv, tok, opts, languages=["en"])
    sp = tok.special
    row = res.tokens[0, res.prompt_len:]
    content = []
    for t in row:
        if t == sp.eot:
            break
        content.append(int(t))
    return res, content, sp


def test_greedy_timestamp_grammar(setup):
    res, content, sp = _run(setup, max_new_tokens=48)
    assert len(content) > 0
    # First sampled token must be a timestamp within max_initial (1.0 s).
    assert sp.is_timestamp(content[0])
    assert content[0] <= sp.timestamp_begin + 50
    # Timestamps non-decreasing.
    ts = [t for t in content if sp.is_timestamp(t)]
    assert ts == sorted(ts)
    # No triple timestamps (pairs at most).
    for i in range(len(content) - 2):
        assert not (sp.is_timestamp(content[i])
                    and sp.is_timestamp(content[i + 1])
                    and sp.is_timestamp(content[i + 2]))
    # Never sampled: meta tokens.
    banned = {sp.sot, sp.no_timestamps, sp.no_speech, sp.translate,
              sp.transcribe, sp.start_of_prev, sp.start_of_lm}
    assert not banned & set(content)


def test_without_timestamps(setup):
    res, content, sp = _run(setup, without_timestamps=True,
                            max_new_tokens=32)
    assert all(not sp.is_timestamp(t) for t in content)


def test_suppress_mask(setup):
    cfg, params, xkv, tok = setup
    opts = decoding.DecodingOptions()
    mask = decoding.build_suppress_mask(tok, cfg, opts)
    sp = tok.special
    assert mask[sp.sot] and mask[sp.no_speech]
    assert mask[cfg.n_vocab:].all()            # vocab padding suppressed
    assert not mask[sp.eot]                    # EOT must stay legal
    assert not mask[sp.timestamp_begin]
    mask_nt = decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions(without_timestamps=True))
    assert mask_nt[sp.timestamp_begin:].all()


def test_decode_deterministic_at_t0(setup):
    r1, c1, _ = _run(setup, max_new_tokens=16)
    r2, c2, _ = _run(setup, max_new_tokens=16)
    assert c1 == c2
    np.testing.assert_allclose(r1.avg_logprob, r2.avg_logprob, rtol=1e-5)


def test_sampling_temperature_changes_output(setup):
    cfg, params, xkv, tok = setup
    o0 = decoding.DecodingOptions(temperature=0.0, max_new_tokens=16)
    o1 = decoding.DecodingOptions(temperature=1.0, max_new_tokens=16)
    r0 = decoding.decode_greedy(cfg, params, xkv, tok, o0, languages=["en"],
                                rng=jax.random.PRNGKey(7))
    r1 = decoding.decode_greedy(cfg, params, xkv, tok, o1, languages=["en"],
                                rng=jax.random.PRNGKey(7))
    assert not np.array_equal(r0.tokens, r1.tokens)


def test_detect_language(setup):
    cfg, params, xkv, tok = setup
    langs, probs = decoding.detect_language(cfg, params, xkv, tok)
    assert len(langs) == 1
    assert langs[0] in tok.special.languages
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)


def test_no_speech_prob_in_range(setup):
    res, _, _ = _run(setup, max_new_tokens=8)
    assert 0.0 <= res.no_speech_prob[0] <= 1.0
    assert np.isfinite(res.avg_logprob).all()


def test_prompt_prefix(setup):
    """Previous-text conditioning: prompt = [startofprev] + prev + sot seq."""
    cfg, params, xkv, tok = setup
    sp = tok.special
    prev = tok.encode("hello there")
    opts = decoding.DecodingOptions(max_new_tokens=8)
    res = decoding.decode_greedy(cfg, params, xkv, tok, opts,
                                 prompt_ids=[sp.start_of_prev] + prev,
                                 languages=["en"])
    assert res.prompt_len == len(prev) + 4   # prev+startofprev + sot,lang,task
    assert res.tokens.shape[1] <= cfg.n_text_ctx
