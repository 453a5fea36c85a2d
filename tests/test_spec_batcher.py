"""Speculative CONTINUOUS BATCHING: batcher.spec_step must be
token-identical to batcher.step for any draft — the serving-path twin of
tests/test_speculative.py's one-shot guarantee. (Beyond-parity feature:
whisper.cpp decodes strictly sequentially, src/engine/whisper.rs:204-305.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import CONFIGS, get_config
from openhush_tpu.runtime.server import EngineServer
from openhush_tpu.text.tokenizer import WhisperTokenizer

pytestmark = pytest.mark.slow

NO_GUARDS = dict(temperatures=(0.0,), logprob_threshold=-1e9,
                 no_speech_threshold=2.0)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(42))
    draft_cfg = CONFIGS["test-draft"]
    draft_params = whisper.init_params(draft_cfg, jax.random.PRNGKey(7))
    tok = WhisperTokenizer(cfg.n_langs)
    return cfg, params, draft_cfg, draft_params, tok


def _run_server(server, audios, max_turns=600):
    sids = []
    for i, audio in enumerate(audios):
        sid = server.open_session()
        sids.append(sid)
        server.submit_window(sid, audio, window_id=i)
    results = {}
    for _ in range(max_turns):
        server.run_once()
        for sid in sids:
            if sid not in results:
                r = server.poll(sid)
                if r is not None:
                    results[sid] = r
        if len(results) == len(sids):
            break
    assert len(results) == len(sids), "server did not finish all windows"
    return [results[sid] for sid in sids]


def _audios(n, seed=3, secs=2):
    rng = np.random.default_rng(seed)
    return [(0.2 * rng.standard_normal(16000 * secs)).astype(np.float32)
            for _ in range(n)]


@pytest.mark.parametrize("k_spec", [3, 4])
def test_spec_server_token_exact_vs_plain(setup, k_spec):
    """Same windows through a speculative server and a plain one →
    identical content tokens, for a RANDOM (mostly-rejected) draft."""
    cfg, params, dcfg, dparams, tok = setup
    audios = _audios(3)
    plain = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok, **NO_GUARDS)
    spec = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                        dtype=jnp.float32, tokenizer=tok,
                        draft=(dcfg, dparams), k_spec=k_spec,
                        spec_policy="always", **NO_GUARDS)
    assert spec.draft_cfg is not None
    r_plain = _run_server(plain, audios)
    r_spec = _run_server(spec, audios)
    for rp, rs in zip(r_plain, r_spec):
        assert rp.tokens == rs.tokens
        assert rp.text == rs.text
        np.testing.assert_allclose(rp.avg_logprob, rs.avg_logprob,
                                   atol=2e-3)


def test_spec_server_output_invariant_to_draft(setup):
    """Output must be invariant to the draft weights (speed-only role):
    two different random drafts → identical serving output."""
    cfg, params, dcfg, dparams, tok = setup
    sliced = whisper.init_params(dcfg, jax.random.PRNGKey(99),
                                 dtype=jnp.float32)
    audios = _audios(2, seed=11)
    spec1 = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok,
                         draft=(dcfg, dparams), spec_policy="always",
                         **NO_GUARDS)
    spec2 = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok,
                         draft=(dcfg, sliced), spec_policy="always",
                         **NO_GUARDS)
    r1 = _run_server(spec1, audios)
    r2 = _run_server(spec2, audios)
    for a, b in zip(r1, r2):
        assert a.tokens == b.tokens


def test_spec_server_no_timestamps_mode(setup):
    cfg, params, dcfg, dparams, tok = setup
    audios = _audios(2, seed=5)
    plain = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok, **NO_GUARDS)
    spec = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                        dtype=jnp.float32, tokenizer=tok,
                        draft=(dcfg, dparams), spec_policy="always",
                         **NO_GUARDS)
    for srv in (plain, spec):
        for i, a in enumerate(audios):
            sid = srv.open_session()
            srv.submit_window(sid, a, window_id=i, timestamps=False)
    # run both synchronously to completion
    outs = []
    for srv in (plain, spec):
        res = []
        for _ in range(600):
            srv.run_once()
            for sid in list(srv._results):
                r = srv.poll(sid)
                if r is not None:
                    res.append((sid, r.tokens))
            if len(res) == len(audios):
                break
        outs.append(sorted(res))
    assert outs[0] == outs[1]


def test_spec_server_incompatible_draft_disabled(setup):
    cfg, params, _, _, tok = setup
    bad_cfg = dataclasses.replace(CONFIGS["test-draft"], name="bad",
                                  n_text_state=128, n_text_head=4)
    bad_params = whisper.init_params(bad_cfg, jax.random.PRNGKey(1))
    srv = EngineServer(cfg, params, n_slots=2, dtype=jnp.float32,
                       tokenizer=tok, draft=(bad_cfg, bad_params),
                       **NO_GUARDS)
    assert srv.draft_cfg is None          # falls back to plain stepping
    r = _run_server(srv, _audios(1))
    assert r[0] is not None


def test_spec_policy_auto(setup):
    """spec_policy="auto" (default) applies the measured crossover
    (docs/STATUS.md r3: spec loses at batch even at accept=1.0, wins ~2x
    single-stream): a burst of windows runs the PLAIN step, a lone window
    runs the SPECULATIVE step — re-picked only when the batcher drains —
    and both modes stay token-exact vs an always-plain server."""
    cfg, params, dcfg, dparams, tok = setup
    srv = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                       dtype=jnp.float32, tokenizer=tok,
                       draft=(dcfg, dparams), **NO_GUARDS)
    assert srv.spec_policy == "auto" and not srv._spec_mode
    # Even batch: every drain point sees 0 or 2 waiting → all-plain.
    r_batch = _run_server(srv, _audios(4))
    assert srv.spec_iters == 0            # >1 waiting → plain dispatch
    [r_one] = _run_server(srv, _audios(1, seed=21))
    assert srv.spec_iters > 0             # lone window → spec dispatch
    # Odd batch: the TAIL window decodes alone, so auto flips it to the
    # spec path at the drain point (single-stream latency win) — and the
    # output must still be exact.
    iters_before = srv.spec_iters
    r_odd = _run_server(srv, _audios(3, seed=33))
    assert srv.spec_iters > iters_before

    plain = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok, **NO_GUARDS)
    rp_batch = _run_server(plain, _audios(4))
    [rp_one] = _run_server(plain, _audios(1, seed=21))
    rp_odd = _run_server(plain, _audios(3, seed=33))
    for a, b in zip(r_batch + [r_one] + r_odd,
                    rp_batch + [rp_one] + rp_odd):
        assert a.tokens == b.tokens


def test_spec_auto_interleaved_sessions_converge_to_plain(setup):
    """Two sessions whose windows ALTERNATE — each window arriving while
    the other session's decode is in flight — must not serialize on
    single-stream speculation (at every drain point exactly one window
    is waiting, so the naive crossover rule would re-pick spec forever
    and double every window's latency). The auto policy instead: never
    admits a second window into a spec batch (measured loser even at
    accept=1.0), records the blocked arrival as concurrency evidence,
    re-picks PLAIN at the next drain, and from then on batches the
    sessions concurrently. A fully idle drain forgets the evidence so a
    later lone window (push-to-talk traffic) speculates again. Outputs
    stay token-exact vs an always-plain server throughout."""
    cfg, params, dcfg, dparams, tok = setup
    srv = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                       dtype=jnp.float32, tokenizer=tok,
                       draft=(dcfg, dparams), **NO_GUARDS)
    audios = _audios(4, seed=55)
    s1, s2 = srv.open_session(), srv.open_session()

    srv.submit_window(s1, audios[0], window_id=0)
    srv.run_once()                        # lone window → spec decode
    assert srv._spec_mode and srv.spec_iters > 0
    with srv._lock:
        assert len(srv._slots) == 1      # w0 still in flight

    # Session 2's window arrives MID-DECODE: the cap makes it wait (spec
    # occupancy never exceeds 1) and flags the concurrency.
    srv.submit_window(s2, audios[1], window_id=1)
    results = {}
    both_in_plain = False
    w2_submitted = False
    for _ in range(600):
        srv.run_once()
        with srv._lock:
            occ = len(srv._slots)
        if srv._spec_mode:
            assert occ <= 1              # no spec batch, ever
        elif occ == 2:
            both_in_plain = True         # concurrent plain decode
        if (r := srv.poll(s1)) is not None:
            results[2 if 0 in results else 0] = r
        if 0 in results and srv._spec_blocked and not w2_submitted:
            # w0 done, w1 headed through the plain path: session 1's
            # next window arrives on its heels — plain admission batches
            # the two sessions concurrently.
            srv.submit_window(s1, audios[2], window_id=2)
            w2_submitted = True
        if 1 not in results and (rb := srv.poll(s2)) is not None:
            results[1] = rb
        if len(results) == 3:
            break
    assert len(results) == 3, "interleaved windows did not finish"
    assert srv._spec_blocked             # evidence recorded
    assert not srv._spec_mode            # converged to plain
    assert both_in_plain                 # w1+w2 actually batched

    # Idle drain forgets the evidence: a lone window speculates again.
    srv.run_once()
    iters_before = srv.spec_iters
    srv.submit_window(s2, audios[3], window_id=3)
    for _ in range(600):
        srv.run_once()
        if (r3 := srv.poll(s2)) is not None:
            results[3] = r3
            break
    assert srv.spec_iters > iters_before

    plain = EngineServer(cfg, params, n_slots=2, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok, **NO_GUARDS)
    ps = plain.open_session()
    for i, audio in enumerate(audios):
        plain.submit_window(ps, audio, window_id=i)
        for _ in range(600):
            plain.run_once()
            if (rp := plain.poll(ps)) is not None:
                assert results[i].tokens == rp.tokens
                break
        else:
            raise AssertionError("plain reference did not finish")


def test_spec_force_accept_unreachable_via_env(setup, monkeypatch):
    """The bench-only accept=1.0 mode is constructor-only (VERDICT r3
    weak #3): the retired env var must change nothing."""
    cfg, params, dcfg, dparams, tok = setup
    monkeypatch.setenv("OPENHUSH_SPEC_FORCE_ACCEPT", "1")
    srv = EngineServer(cfg, params, n_slots=1, inner_steps=8,
                       dtype=jnp.float32, tokenizer=tok,
                       draft=(dcfg, dparams), spec_policy="always",
                       **NO_GUARDS)
    assert srv.spec_force_accept is False
    plain = EngineServer(cfg, params, n_slots=1, inner_steps=8,
                         dtype=jnp.float32, tokenizer=tok, **NO_GUARDS)
    [rs] = _run_server(srv, _audios(1, seed=13))
    [rp] = _run_server(plain, _audios(1, seed=13))
    assert rs.tokens == rp.tokens


def test_spec_server_fallback_ladder(setup):
    """Quality-guard retries (readmit path) must work under speculation:
    force every first pass to 'fallback' via an impossible logprob
    threshold, then recover at the last ladder temperature."""
    cfg, params, dcfg, dparams, tok = setup
    srv = EngineServer(cfg, params, n_slots=1, inner_steps=8,
                       dtype=jnp.float32, tokenizer=tok,
                       draft=(dcfg, dparams), spec_policy="always",
                       temperatures=(0.0, 0.5), logprob_threshold=1e9,
                       no_speech_threshold=2.0)
    [res] = _run_server(srv, _audios(1, seed=9))
    assert res.temperature == 0.5         # finished at the retry rung
