"""Speculative greedy decoding: token-exactness is the whole contract.

Every emitted token is the BIG model's filtered argmax, so the output
must be byte-identical to decoding.greedy_loop for ANY draft — including
a random-init one that almost never matches (worst case: pure overhead,
zero divergence). Tests run the same window through both loops across
filter modes and batch shapes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import CONFIGS, WhisperConfig
from openhush_tpu.models.whisper.speculative import speculative_greedy_loop
from openhush_tpu.text.tokenizer import WhisperTokenizer

CFG = CONFIGS["test"]
# Draft: same encoder width + vocab (the large-v3 / large-v3-turbo
# relationship), shallower decoder.
DRAFT_CFG = dataclasses.replace(CFG, name="test-draft", n_text_layer=1)


@pytest.fixture(scope="module")
def setup():
    params = whisper.init_params(CFG, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    draft_params = whisper.init_params(DRAFT_CFG, jax.random.PRNGKey(7),
                                       dtype=jnp.float32)
    tok = WhisperTokenizer(CFG.n_langs)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.4
    feats = whisper.encode(CFG, params, mel)
    return params, draft_params, tok, feats


def _run_both(setup, *, timestamps, max_new=28, k_spec=4, quant=False,
              draft_params=None, B=None):
    params, dparams, tok, feats = setup
    dparams = draft_params if draft_params is not None else dparams
    if B is not None:
        feats = feats[:B]
    xkv = (whisper.compute_cross_kv_quant(CFG, params, feats) if quant
           else whisper.compute_cross_kv(CFG, params, feats))
    dxkv = whisper.compute_cross_kv(DRAFT_CFG, dparams, feats)
    opts = decoding.DecodingOptions(without_timestamps=not timestamps)
    prompt = tok.sot_sequence("en", "transcribe", timestamps=timestamps)
    Bv = feats.shape[0]
    parr = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (Bv, 1)))
    suppress = jnp.asarray(decoding.build_suppress_mask(tok, CFG, opts))
    blank = tok.encode(" ")[0]
    common = dict(prompt_len=len(prompt), max_new=max_new,
                  use_timestamps=timestamps, suppress_blank=True,
                  max_initial_index=50, blank_token=int(blank))

    cache_len = len(prompt) + max_new + k_spec + 2
    g_cache = whisper.init_kv_cache(CFG, Bv, max_len=cache_len)
    g = decoding.greedy_loop(CFG, params, xkv, g_cache, parr, suppress,
                             jnp.float32(0.0), jax.random.PRNGKey(0),
                             **common)

    s_cache = whisper.init_kv_cache(CFG, Bv, max_len=cache_len)
    d_cache = whisper.init_kv_cache(DRAFT_CFG, Bv, max_len=cache_len)
    s = speculative_greedy_loop(CFG, params, DRAFT_CFG, dparams, xkv,
                                dxkv, s_cache, d_cache, parr, suppress,
                                k_spec=k_spec, **common)
    return g, s


@pytest.mark.parametrize("timestamps", [False, True])
def test_token_exact_vs_greedy(setup, timestamps):
    g, s = _run_both(setup, timestamps=timestamps)
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(s[0]))
    np.testing.assert_array_equal(np.asarray(g[2]), np.asarray(s[2]))
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(s[1]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(g[3]), np.asarray(s[3]),
                               atol=1e-5)


@pytest.mark.slow
def test_token_exact_with_int8_cross_kv(setup):
    g, s = _run_both(setup, timestamps=True, quant=True)
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(s[0]))


def test_token_exact_single_row(setup):
    g, s = _run_both(setup, timestamps=False, B=1, k_spec=6)
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(s[0]))


def test_different_draft_same_output(setup):
    """Output is invariant to the draft weights (speed-only role)."""
    other = whisper.init_params(DRAFT_CFG, jax.random.PRNGKey(99),
                                dtype=jnp.float32)
    _, s1 = _run_both(setup, timestamps=True)
    _, s2 = _run_both(setup, timestamps=True, draft_params=other)
    np.testing.assert_array_equal(np.asarray(s1[0]), np.asarray(s2[0]))


@pytest.mark.slow
def test_engine_transcribe_with_draft_token_exact():
    """Full engine path (seek loop, ladder, segment parsing): a draft
    engine must transcribe IDENTICALLY to a plain one."""
    from openhush_tpu.runtime.engine import WhisperEngine

    rng = np.random.default_rng(11)
    audio = (0.2 * rng.standard_normal(16000 * 4)).astype(np.float32)
    plain = WhisperEngine(model="test", allow_random_init=True,
                          dtype="float32", language="en")
    spec = WhisperEngine(model="test", allow_random_init=True,
                         dtype="float32", language="en",
                         draft_model="test-draft")
    assert spec.draft_params is not None
    r1 = plain.transcribe(audio)
    r2 = spec.transcribe(audio)
    assert r1.text == r2.text
    assert [s.tokens for s in r1.segments] == \
        [s.tokens for s in r2.segments]


def test_engine_incompatible_draft_degrades_gracefully():
    from openhush_tpu.runtime.engine import WhisperEngine

    eng = WhisperEngine(model="test", allow_random_init=True,
                        dtype="float32", draft_model="base")
    assert eng.draft_params is None          # dims differ → disabled
    rng = np.random.default_rng(2)
    audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    assert eng.transcribe(audio) is not None  # plain path still works


@pytest.mark.slow
def test_long_prompt_max_length_exact(setup):
    """ADVICE r2 regression: with a long prev-context prompt and a
    max-length decode, block writes reach prompt+max_new+K-2; the cache
    must be sized past n_text_ctx so dynamic_update_slice never clamps
    (a clamped start silently overwrites earlier KV and breaks greedy
    exactness at the tail). EOT is suppressed so rows actually run to
    max_new, replicating the worst case (prompt 228, max_new 219, K=5:
    452 > n_text_ctx 448)."""
    params, dparams, tok, feats = setup
    feats = feats[:1]
    xkv = whisper.compute_cross_kv(CFG, params, feats)
    dxkv = whisper.compute_cross_kv(DRAFT_CFG, dparams, feats)
    opts = decoding.DecodingOptions(without_timestamps=True)
    sot = tok.sot_sequence("en", "transcribe", timestamps=False)
    rng = np.random.default_rng(3)
    prev = rng.integers(100, 5000, 228 - len(sot)).tolist()
    prompt = prev + sot
    k_spec = 5
    max_new = CFG.n_text_ctx - len(prompt) - 1          # 219
    suppress = np.asarray(decoding.build_suppress_mask(tok, CFG, opts))
    suppress[tok.special.eot] = True                    # force full length
    suppress = jnp.asarray(suppress)
    parr = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    blank = tok.encode(" ")[0]
    common = dict(prompt_len=len(prompt), max_new=max_new,
                  use_timestamps=False, suppress_blank=True,
                  max_initial_index=50, blank_token=int(blank))
    # The exact sizing decode_speculative now uses (no n_text_ctx min).
    cache_len = ((len(prompt) + max_new + k_spec + 63) // 64) * 64
    assert cache_len >= len(prompt) + max_new + k_spec
    g_cache = whisper.init_kv_cache(CFG, 1, max_len=cache_len)
    g = decoding.greedy_loop(CFG, params, xkv, g_cache, parr, suppress,
                             jnp.float32(0.0), jax.random.PRNGKey(0),
                             **common)
    s_cache = whisper.init_kv_cache(CFG, 1, max_len=cache_len)
    d_cache = whisper.init_kv_cache(DRAFT_CFG, 1, max_len=cache_len)
    s = speculative_greedy_loop(CFG, params, DRAFT_CFG, dparams, xkv,
                                dxkv, s_cache, d_cache, parr, suppress,
                                k_spec=k_spec, **common)
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(s[0]))
    assert int(np.asarray(g[2])[0]) == max_new
