"""Beam search invariants + consistency with greedy on peaked distributions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import beam, decoding, model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.text.tokenizer import WhisperTokenizer



# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

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


def _content(res, tok):
    sp = tok.special
    out = []
    for t in res.tokens[0, res.prompt_len:]:
        if t == sp.eot:
            break
        out.append(int(t))
    return out


def test_beam_runs_and_respects_grammar(setup):
    cfg, params, xkv, tok = setup
    opts = decoding.DecodingOptions(beam_size=3, max_new_tokens=24)
    res = beam.decode_beam(cfg, params, xkv, tok, opts, languages=["en"])
    sp = tok.special
    content = _content(res, tok)
    assert len(content) > 0
    assert sp.is_timestamp(content[0])
    ts = [t for t in content if sp.is_timestamp(t)]
    assert ts == sorted(ts)
    banned = {sp.sot, sp.no_timestamps, sp.no_speech}
    assert not banned & set(content)
    assert np.isfinite(res.avg_logprob).all()


def test_beam_score_at_least_greedy(setup):
    """Beam(k) must find a hypothesis scoring >= greedy's (same scoring)."""
    cfg, params, xkv, tok = setup
    g = decoding.decode_greedy(
        cfg, params, xkv, tok,
        decoding.DecodingOptions(max_new_tokens=16, without_timestamps=True),
        languages=["en"])
    b = beam.decode_beam(
        cfg, params, xkv, tok,
        decoding.DecodingOptions(beam_size=4, max_new_tokens=16,
                                 without_timestamps=True),
        languages=["en"])
    # avg_logprob comparison: beam score is length-averaged sum logprob.
    assert b.avg_logprob[0] >= g.avg_logprob[0] - 1e-3


def test_beam_batch(setup):
    cfg, params, xkv, tok = setup
    xkv2 = whisper.KVCache(jnp.concatenate([xkv.k, xkv.k], axis=1),
                           jnp.concatenate([xkv.v, xkv.v], axis=1))
    opts = decoding.DecodingOptions(beam_size=2, max_new_tokens=8,
                                    without_timestamps=True)
    res = beam.decode_beam(cfg, params, xkv2, tok, opts, languages=["en"])
    assert res.tokens.shape[0] == 2
    # Identical audio rows → identical beams.
    np.testing.assert_array_equal(res.tokens[0], res.tokens[1])


def test_beam_with_quantized_cross_kv(setup):
    """Beam over int8 cross-KV (the bf16 production path) must behave like
    beam over fp cross-KV."""
    cfg, params, xkv, tok = setup
    import numpy as np
    from openhush_tpu.models.whisper import model as whisper_model
    # Rebuild quantized xkv from the same features used for `xkv`.
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    feats = whisper_model.encode(cfg, params, mel)
    xkv_q = whisper_model.compute_cross_kv_quant(cfg, params, feats)
    opts = decoding.DecodingOptions(beam_size=2, max_new_tokens=12,
                                    without_timestamps=True)
    r_fp = beam.decode_beam(cfg, params, xkv, tok, opts, languages=["en"])
    r_q = beam.decode_beam(cfg, params, xkv_q, tok, opts, languages=["en"])
    np.testing.assert_array_equal(r_fp.tokens, r_q.tokens)
