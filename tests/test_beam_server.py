"""Beam serving: beam-group batcher parity with the one-shot beam search,
best-of sampling parity with the greedy batcher, and the BeamEngineServer
end-to-end loop (reference scope: whisper.cpp exposes beam params per job,
src/engine/whisper.rs:204-305; openai/whisper runs beam at T=0 and best-of
sampling on ladder retries)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import beam, decoding, model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.ops import mel as mel_ops
from openhush_tpu.runtime import batcher, beam_batcher
from openhush_tpu.runtime.beam_server import BeamEngineServer
from openhush_tpu.text.tokenizer import WhisperTokenizer


# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(42))
    tok = WhisperTokenizer(cfg.n_langs)
    return cfg, params, tok


def _xkv_quant(cfg, params, seed):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    feats = whisper.encode(cfg, params, mel)
    return whisper.compute_cross_kv_quant(cfg, params, feats)


def _stack_xkv(parts):
    return whisper.QuantKVCache(
        *[jnp.concatenate([getattr(p, f) for p in parts], axis=1)
          for f in ("k", "k_scale", "v", "v_scale")])


def _oneshot_beam(cfg, params, tok, xkv, *, beam_size, use_timestamps,
                  max_new, length_penalty=None):
    prompt = tok.sot_sequence("en", "transcribe", timestamps=use_timestamps)
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg,
        decoding.DecodingOptions(without_timestamps=not use_timestamps)))
    toks, scores, lens, no_speech = beam.beam_search_loop(
        cfg, params, xkv, jnp.asarray([prompt], jnp.int32), suppress,
        beam_size=beam_size, prompt_len=len(prompt), max_new=max_new,
        use_timestamps=use_timestamps, suppress_blank=True,
        max_initial_index=50, blank_token=int(tok.encode(" ")[0]),
        length_penalty=length_penalty)
    sp = tok.special
    content = [int(t) for t in
               np.asarray(toks)[0, len(prompt):len(prompt) + int(lens[0])]
               if t != sp.eot]
    return content, float(scores[0]), float(no_speech[0])


def _run_group_to_done(cfg, params, state, suppress, tok, group, *,
                       inner_steps=8, max_iters=60, length_penalty=None):
    for _ in range(max_iters):
        state = beam_batcher.step(cfg, params, state, suppress,
                                  inner_steps=inner_steps,
                                  blank_token=int(tok.encode(" ")[0]),
                                  length_penalty=length_penalty)
        if bool(np.asarray(state.finished[group])):
            break
    return state


def _harvest_group(state, tok, group, prompt_len, length_penalty=None):
    sp = tok.special
    fetch = jax.device_get((state.tokens, state.alive_lp, state.alive_len,
                            state.fin_scores, state.fin_tokens,
                            state.fin_lens, state.temperature,
                            state.done_row))
    toks, alp, aln, fsc, ftk, fln, temp, done = fetch
    row, length, score = beam_batcher.best_hypothesis(
        toks[group], alp[group], aln[group], fsc[group], ftk[group],
        fln[group], temp[group], done[group],
        length_penalty=length_penalty)
    content = [int(t) for t in row[prompt_len:prompt_len + length]
               if t != sp.eot]
    return content, score


@pytest.mark.parametrize("use_timestamps", [True, False])
def test_beam_group_matches_oneshot_beam(setup, use_timestamps):
    """Two windows in two concurrent beam groups must each reproduce the
    B=1 one-shot beam_search_loop result token-for-token (the per-group
    B=1 semantics contract in beam_batcher's docstring)."""
    cfg, params, tok = setup
    K = 3
    xkv_a = _xkv_quant(cfg, params, seed=11)
    xkv_b = _xkv_quant(cfg, params, seed=12)
    prompt = tok.sot_sequence("en", "transcribe", timestamps=use_timestamps)
    max_new = 32
    # Shared serving mask: never includes timestamp suppression — use_ts
    # handles it per-row inside _filter_logits (greedy-server convention).
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions()))

    state = beam_batcher.init_state(cfg, n_groups=2, beam_size=K,
                                    dtype=jnp.float32)
    both = _stack_xkv([xkv_a, xkv_b])
    for g in range(2):
        state = beam_batcher.admit(
            cfg, params, state, jnp.int32(g), both,
            jnp.asarray([prompt], jnp.int32), jnp.asarray(use_timestamps),
            prompt_len=len(prompt), max_new=jnp.int32(max_new),
            row=jnp.int32(g))
    state = _run_group_to_done(cfg, params, state, suppress, tok, 0)
    state = _run_group_to_done(cfg, params, state, suppress, tok, 1)
    assert bool(np.asarray(state.finished[0]))
    assert bool(np.asarray(state.finished[1]))

    for g, xkv in ((0, xkv_a), (1, xkv_b)):
        got, got_score = _harvest_group(state, tok, g, len(prompt))
        ref, ref_score, _ = _oneshot_beam(
            cfg, params, tok, xkv, beam_size=K,
            use_timestamps=use_timestamps, max_new=max_new)
        assert got == ref, f"group {g} diverged from one-shot beam"
        assert got_score == pytest.approx(ref_score, abs=1e-4)


def test_beam_group_length_penalty_matches_oneshot(setup):
    """GoogleNMT length penalty must flow through scoring identically."""
    cfg, params, tok = setup
    xkv = _xkv_quant(cfg, params, seed=21)
    prompt = tok.sot_sequence("en", "transcribe", timestamps=True)
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions()))
    state = beam_batcher.init_state(cfg, n_groups=1, beam_size=2,
                                    dtype=jnp.float32)
    state = beam_batcher.admit(
        cfg, params, state, jnp.int32(0), xkv,
        jnp.asarray([prompt], jnp.int32), jnp.asarray(True),
        prompt_len=len(prompt), max_new=jnp.int32(24))
    state = _run_group_to_done(cfg, params, state, suppress, tok, 0,
                               length_penalty=1.0)
    got, got_score = _harvest_group(state, tok, 0, len(prompt),
                                    length_penalty=1.0)
    ref, ref_score, _ = _oneshot_beam(cfg, params, tok, xkv, beam_size=2,
                                      use_timestamps=True, max_new=24,
                                      length_penalty=1.0)
    assert got == ref
    assert got_score == pytest.approx(ref_score, abs=1e-4)


def test_beam_fallback_path_matches_grouped(setup, monkeypatch):
    """K·H > one lane tile falls back to cross-KV tiling + parent-gather;
    the two formulations must agree token-for-token. The tiny test config
    always takes the grouped path, so force the gate off — both beam.py
    and beam_batcher.py route through whisper.beam_grouped_ok. The gate is
    not part of the jit cache key (it is derived from cfg/K in production),
    so caches must be cleared around the forced-fallback traces."""
    cfg, params, tok = setup
    K = 3
    xkv = _xkv_quant(cfg, params, seed=31)
    max_new = 24
    ref, ref_score, _ = _oneshot_beam(cfg, params, tok, xkv, beam_size=K,
                                      use_timestamps=False, max_new=max_new)

    monkeypatch.setattr(whisper, "beam_grouped_ok", lambda _cfg, _k: False)
    jax.clear_caches()
    try:
        got, got_score, _ = _oneshot_beam(
            cfg, params, tok, xkv, beam_size=K, use_timestamps=False,
            max_new=max_new)
        assert got == ref, "fallback one-shot diverged from grouped"
        assert got_score == pytest.approx(ref_score, abs=1e-4)

        prompt = tok.sot_sequence("en", "transcribe", timestamps=False)
        suppress = jnp.asarray(decoding.build_suppress_mask(
            tok, cfg, decoding.DecodingOptions()))
        state = beam_batcher.init_state(cfg, n_groups=1, beam_size=K,
                                        dtype=jnp.float32)
        state = beam_batcher.admit(
            cfg, params, state, jnp.int32(0), xkv,
            jnp.asarray([prompt], jnp.int32), jnp.asarray(False),
            prompt_len=len(prompt), max_new=jnp.int32(max_new))
        state = _run_group_to_done(cfg, params, state, suppress, tok, 0)
        assert bool(np.asarray(state.finished[0]))
        got2, score2 = _harvest_group(state, tok, 0, len(prompt))
        assert got2 == ref, "fallback batcher diverged from grouped"
        assert score2 == pytest.approx(ref_score, abs=1e-4)
    finally:
        jax.clear_caches()   # drop the fallback-gated compilations


def test_beam_sampling_rows_match_greedy_batcher(setup):
    """A T>0 group runs best-of-K independent sampling: with the same
    per-row RNG keys, each row must emit exactly the tokens of a greedy
    batcher slot at that temperature (shared _filter_logits +
    _choose_tokens — the ladder-retry parity contract)."""
    cfg, params, tok = setup
    K = 2
    temp = 0.7
    xkv = _xkv_quant(cfg, params, seed=31)
    prompt = tok.sot_sequence("en", "transcribe")
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions()))
    keys = jax.random.split(jax.random.PRNGKey(99), K)
    rngs = np.asarray(jax.random.key_data(keys), np.uint32)
    sp = tok.special
    blank = int(tok.encode(" ")[0])
    n_dispatch, inner = 3, 8

    # Greedy batcher: K slots, same window, same per-slot keys.
    gstate = batcher.init_state(cfg, n_slots=K, dtype=jnp.float32)
    for r in range(K):
        gstate = batcher.admit(cfg, params, gstate, jnp.int32(r), xkv,
                               jnp.asarray([prompt], jnp.int32),
                               jnp.asarray(True), prompt_len=len(prompt),
                               temperature=jnp.float32(temp),
                               rng=jnp.asarray(rngs[r]))
    for _ in range(n_dispatch):
        gstate = batcher.step(cfg, params, gstate, suppress,
                              inner_steps=inner, blank_token=blank,
                              rep_threshold=1000)
    gtoks, gpos = jax.device_get((gstate.tokens, gstate.pos))

    # Beam batcher: one sampling-mode group.
    bstate = beam_batcher.init_state(cfg, n_groups=1, beam_size=K,
                                     dtype=jnp.float32)
    bstate = beam_batcher.admit(
        cfg, params, bstate, jnp.int32(0), xkv,
        jnp.asarray([prompt], jnp.int32), jnp.asarray(True),
        prompt_len=len(prompt), max_new=jnp.int32(400),
        temperature=jnp.float32(temp), rng=jnp.asarray(rngs))
    for _ in range(n_dispatch):
        bstate = beam_batcher.step(cfg, params, bstate, suppress,
                                   inner_steps=inner, blank_token=blank)
    btoks, baln = jax.device_get((bstate.tokens, bstate.alive_len))

    P = len(prompt)
    for r in range(K):
        ref = [int(t) for t in gtoks[r, P:gpos[r]] if t != sp.eot]
        got = [int(t) for t in btoks[0, r, P:P + int(baln[0, r])]
               if t != sp.eot]
        assert got == ref, f"sampling row {r} diverged from greedy slot"


# Random-init weights trip the quality ladder on every window; tests not
# about the guards neutralize them (same constants as test_batcher.py).
NO_GUARDS = dict(temperatures=(0.0,), logprob_threshold=-1e9,
                 no_speech_threshold=2.0)


def test_beam_server_end_to_end_matches_oneshot(setup):
    """Two sessions through BeamEngineServer: identical audio must give
    identical tokens, and each result must equal the B=1 one-shot beam on
    the server's own prepared cross-KV (full-path token exactness)."""
    cfg, params, tok = setup
    K = 2
    server = BeamEngineServer(cfg, params, n_slots=2, beam_size=K,
                              inner_steps=8, dtype=jnp.float32,
                              tokenizer=tok, **NO_GUARDS)
    rng = np.random.default_rng(5)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    sids = [server.open_session(), server.open_session()]
    for sid in sids:
        server.submit_window(sid, audio, window_id=0, timestamps=True)
    for _ in range(200):
        server.run_once()
        if all(server._results[s].qsize() for s in sids):
            break
    res = [server.poll(s) for s in sids]
    assert all(r is not None for r in res)
    assert res[0].tokens == res[1].tokens
    assert res[0].latency > 0 and 0.0 <= res[0].no_speech_prob <= 1.0

    # One-shot reference over the server's own prep pipeline.
    n_samples = server.audio_ctx * 2 * mel_ops.HOP_LENGTH
    window = np.zeros((1, n_samples), np.float32)
    window[0, :len(audio)] = audio
    xkv, _, _ = server._prep_fn(params, None, jnp.asarray(window))
    prompt = tok.sot_sequence("en", "transcribe", timestamps=True)
    ref, _, _ = _oneshot_beam(cfg, params, tok, xkv, beam_size=K,
                              use_timestamps=True,
                              max_new=server.room_cap - len(prompt))
    assert res[0].tokens == ref
    for sid in sids:
        server.close_session(sid)


def test_beam_server_fallback_ladder(setup):
    """Random-init logprobs fail the threshold → the group retries as
    best-of-K sampling at the next ladder temperature and still emits."""
    cfg, params, tok = setup
    server = BeamEngineServer(cfg, params, n_slots=1, beam_size=2,
                              inner_steps=8, dtype=jnp.float32,
                              tokenizer=tok,
                              temperatures=(0.0, 0.4),
                              logprob_threshold=0.0,
                              no_speech_threshold=2.0)
    rng = np.random.default_rng(6)
    audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    sid = server.open_session()
    server.submit_window(sid, audio, window_id=0)
    for _ in range(400):
        server.run_once()
        if server._results[sid].qsize():
            break
    res = server.poll(sid)
    assert res is not None
    assert res.temperature == pytest.approx(0.4)
    server.close_session(sid)


def test_beam_server_peek_and_queue(setup):
    cfg, params, tok = setup
    server = BeamEngineServer(cfg, params, n_slots=1, beam_size=2,
                              inner_steps=4, dtype=jnp.float32,
                              tokenizer=tok, **NO_GUARDS)
    rng = np.random.default_rng(7)
    audio = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    sid = server.open_session()
    server.submit_window(sid, audio, window_id=0)
    peeked = None
    for _ in range(300):
        server.run_once()
        p = server.peek(sid)
        if p:
            peeked = list(p)
        if server._results[sid].qsize():
            break
    res = server.poll(sid)
    assert res is not None
    assert peeked is not None  # saw a mid-decode partial
    assert server.queue_depth() == 0
    server.close_session(sid)


def test_beam_int8_self_cache_modes(setup):
    """Opt-in int8 self-cache for the GROUPED beam step (VERDICT r4 #3a):
    each beam's new K/V is quantized at write time and the scale rows
    ride the same ancestry mask as the values (model.decode_beam_step).
    Like the greedy int8 self-cache, quantization error COMPOUNDS through
    the autoregressive chain, so the contract is bounded logit drift per
    step plus an end-to-end run — not token equality on random weights."""
    cfg, params, tok = setup
    K = 3
    xkv = _xkv_quant(cfg, params, seed=41)
    prompt = tok.sot_sequence("en", "transcribe", timestamps=False)
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions()))
    blank = int(tok.encode(" ")[0])

    # 1. Per-dispatch logit accuracy on a shared prefix: one inner step
    #    from identical prefills, fp32 state vs int8 state.
    def one_step_logits(int8):
        state = beam_batcher.init_state(cfg, n_groups=1, beam_size=K,
                                        dtype=jnp.float32,
                                        int8_self_cache=int8)
        state = beam_batcher.admit(
            cfg, params, state, jnp.int32(0), xkv,
            jnp.asarray([prompt], jnp.int32), jnp.asarray(False),
            prompt_len=len(prompt), max_new=jnp.int32(16))
        state = beam_batcher.step(cfg, params, state, suppress,
                                  inner_steps=1, blank_token=blank)
        return np.asarray(state.last_logits, np.float32)

    lf, lq = one_step_logits(False), one_step_logits(True)
    valid = np.isfinite(lf) & np.isfinite(lq)
    scale = np.abs(lf[valid]).max()
    assert np.abs(lf[valid] - lq[valid]).max() < 0.02 * scale, \
        "int8 beam self-cache logit drift exceeds 2%"

    # 2. End-to-end: int8-mode beam server completes a window with the
    #    right buffer dtypes (values int8, per-(pos, head) scales).
    server = BeamEngineServer(cfg, params, n_slots=1, beam_size=K,
                              inner_steps=8, dtype=jnp.float32,
                              tokenizer=tok, int8_self_cache=True,
                              **NO_GUARDS)
    assert server.state.cache_k.dtype == jnp.int8
    assert server.state.cache_ks.shape[-1] == cfg.n_text_head
    rng = np.random.default_rng(17)
    sid = server.open_session()
    server.submit_window(sid, (0.2 * rng.standard_normal(16000 * 2)
                               ).astype(np.float32), window_id=0)
    r = None
    for _ in range(400):
        server.run_once()
        r = server.poll(sid)
        if r is not None:
            break
    assert r is not None
    assert isinstance(r.text, str) and 0.0 <= r.no_speech_prob <= 1.0

    # 3. Default mode keeps fp caches + placeholder scales.
    fp = beam_batcher.init_state(cfg, n_groups=1, beam_size=K,
                                 dtype=jnp.float32)
    assert fp.cache_k.dtype == jnp.float32
    assert fp.cache_ks.shape[2:] == (1, 1)


def test_beam_int8_fallback_matches_grouped(setup, monkeypatch):
    """int8 self-cache through the forced parent-gather fallback must
    reproduce the grouped ancestry-masked step's tokens: both paths
    quantize with the same per-(row, head) recipe (_quantize_heads) and
    fold the same scales, so only fp32 reduction order differs."""
    cfg, params, tok = setup
    K = 3
    xkv = _xkv_quant(cfg, params, seed=43)
    prompt = tok.sot_sequence("en", "transcribe", timestamps=False)
    suppress = jnp.asarray(decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions()))
    max_new = 16

    def run(int8):
        state = beam_batcher.init_state(cfg, n_groups=1, beam_size=K,
                                        dtype=jnp.float32,
                                        int8_self_cache=int8)
        state = beam_batcher.admit(
            cfg, params, state, jnp.int32(0), xkv,
            jnp.asarray([prompt], jnp.int32), jnp.asarray(False),
            prompt_len=len(prompt), max_new=jnp.int32(max_new))
        state = _run_group_to_done(cfg, params, state, suppress, tok, 0)
        assert bool(np.asarray(state.finished[0]))
        return _harvest_group(state, tok, 0, len(prompt))

    got_g, score_g = run(True)
    monkeypatch.setattr(whisper, "beam_grouped_ok", lambda _cfg, _k: False)
    jax.clear_caches()
    try:
        got_f, score_f = run(True)
        assert got_f == got_g, "int8 fallback diverged from int8 grouped"
        assert score_f == pytest.approx(score_g, abs=1e-4)
    finally:
        jax.clear_caches()


def test_beam_server_deep_stepping_token_exact(setup):
    """Deep stepping (VERDICT r4 #3b): when every group is occupied the
    beam server runs deep_factor× longer scans per dispatch. Token-exact
    by construction — the scan just runs further; frozen groups stay
    masked — so a saturated deep server must emit exactly what the
    shallow server emits."""
    cfg, params, tok = setup
    rng = np.random.default_rng(9)
    audios = [(0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
              for _ in range(4)]

    def run(deep_factor):
        server = BeamEngineServer(cfg, params, n_slots=2, beam_size=2,
                                  inner_steps=4, dtype=jnp.float32,
                                  tokenizer=tok, deep_factor=deep_factor,
                                  max_admissions_per_turn=2, **NO_GUARDS)
        sid = server.open_session()
        for i, a in enumerate(audios):
            server.submit_window(sid, a, window_id=i, timestamps=False)
        got = {}
        for _ in range(800):
            server.run_once()
            while True:
                r = server.poll(sid)
                if r is None:
                    break
                got[r.window_id] = r.tokens
            if len(got) == len(audios):
                break
        server.close_session(sid)
        return got

    shallow, deep = run(1), run(4)
    assert shallow.keys() == deep.keys() == set(range(len(audios)))
    for w in shallow:
        assert shallow[w] == deep[w], f"window {w} diverged under deep"
