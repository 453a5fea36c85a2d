"""Continuous BEAM batching: concurrent beam-search groups, one device loop.

The greedy batcher (runtime/batcher.py) advances one hypothesis per slot;
this module advances one beam-search GROUP of K hypotheses per logical slot,
so the serving path gets whisper.cpp's offline quality mode (beam_size > 1,
/root/reference/src/engine/whisper.rs:204-305 exposes beam params per job)
without falling back to one-window-at-a-time decoding: G concurrent windows
each run a K-beam search inside ONE compiled step, admission/harvest happen
between steps at fixed shapes, exactly like the greedy server.

Semantics per group are IDENTICAL to a B=1 `beam.beam_search_loop` run on
that window alone (token-exact, tests/test_beam_server.py): the expansion
math — top-2K over K·V candidates, EOT routing into the finished set,
length-penalized scores, parent-gathered KV — is the same formulation, with
per-group live masks freezing groups whose stop condition fired. (A B>1
one-shot beam couples rows through its global stop condition; per-group
masking reproduces the B=1 result for every window, which is the better
contract for a server.)

Temperature ladder parity: whisper retries failed windows at T > 0 with
BEST-OF-K independent sampling (openai/whisper DecodingTask: beam_size at
T=0, best_of at T>0; whisper.cpp mirrors this, greedy.best_of in
src/engine/whisper.rs). A group admitted with temperature > 0 runs exactly
that: K independent sampling rows (identity parents, no reordering), harvest
picks the best finished row by length-normalized logprob.

Device state mirrors runtime/batcher.SlotState but with a beam axis:
  cache  [L, G*K, T, H*Dh]   self-attn KV, bf16 — NEVER physically
                             reordered: beam inheritance is an ancestry
                             MASK (`anc`), not a row gather (the gather
                             cost 5.6 ms of the 13.2 ms G=4 K=5 step;
                             model._attend_decode_flat_beam)
  anc    [G, K, K, T] bool   ancestry: query beam i may read cache row r
                             at position t iff its history wrote it
  xkv    [L, G, A, H*Dh]     int8 cross-KV + [L, G, A, H] scales — ONE
                             copy per group, shared by its K beams: the
                             decode step folds the beam dim into the flat
                             attention's query lanes (model.decode
                             cross_group), so the audio context is read
                             once per group per step instead of once per
                             beam (~2 GB/step of redundant int8 reads at
                             G=4, K=5, large-v3 — and K× less HBM state,
                             so the budgeter fits more groups)
  tokens [G, K, T]           prompt + per-beam hypotheses
  alive_lp / fin_* [G, K]    beam bookkeeping (beam.py's alive/finished
                             formulation); alive_lp doubles as per-row
                             sum-logprob in best-of sampling mode
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.beam import _gather_beams, _length_score
from openhush_tpu.models.whisper.config import WhisperConfig
from openhush_tpu.runtime.batcher import _choose_tokens, _filter_logits
from openhush_tpu.text.tokenizer import WhisperTokenizer

NEG_INF = decoding.NEG_INF


class BeamState(NamedTuple):
    cache_k: jax.Array       # [L, G*K, T, H*Dh] (bf16, or int8 opt-in)
    cache_v: jax.Array
    # Self-cache scales [L, G*K, T, H] — meaningful only in int8-self-
    # cache mode (init_state(int8_self_cache=True)); [L, G*K, 1, 1]
    # placeholders otherwise (same convention as batcher.SlotState).
    cache_ks: jax.Array
    cache_vs: jax.Array
    xkv_k: jax.Array         # int8 [L, G, A, H*Dh] — shared per group
    xkv_ks: jax.Array        # f32  [L, G, A, H]
    xkv_v: jax.Array
    xkv_vs: jax.Array
    tokens: jax.Array        # [G, K, T] int32
    alive_lp: jax.Array      # [G, K] f32 (sum logprob per alive beam / row)
    alive_len: jax.Array     # [G, K] int32
    fin_scores: jax.Array    # [G, K] f32 length-normalized
    fin_tokens: jax.Array    # [G, K, T] int32
    fin_lens: jax.Array      # [G, K] int32
    ts_prev: jax.Array       # [G, K] bool
    ts_prevprev: jax.Array   # [G, K] bool
    ts_floor: jax.Array      # [G, K] int32
    use_ts: jax.Array        # [G] bool
    prompt_len: jax.Array    # [G] int32
    step: jax.Array          # [G] int32 — sampled tokens so far
    max_new: jax.Array       # [G] int32 — per-group step budget
    no_speech: jax.Array     # [G] f32
    last_logits: jax.Array   # [G*K, V] f32
    active: jax.Array        # [G] bool
    finished: jax.Array      # [G] bool
    temperature: jax.Array   # [G] f32 — 0 = beam, >0 = best-of sampling
    rng: jax.Array           # [G, K, 2] uint32 (sampling mode)
    done_row: jax.Array      # [G, K] bool (sampling mode per-row EOT)
    anc: jax.Array           # [G, K, K, T] bool ancestry mask


# `tokens` and `step` stay undonated: they are the host-readable tape behind
# EngineServer.peek() in beam mode (same contract as batcher._PEEK_FIELDS).
_PEEK_FIELDS = ("tokens", "step")
_DONATED_FIELDS = tuple(f for f in BeamState._fields if f not in _PEEK_FIELDS)


def _pack(state: BeamState):
    return (tuple(getattr(state, f) for f in _DONATED_FIELDS),
            (state.tokens, state.step))


def _unpack(donated, kept) -> BeamState:
    return BeamState(tokens=kept[0], step=kept[1],
                     **dict(zip(_DONATED_FIELDS, donated)))


def init_state(cfg: WhisperConfig, n_groups: int, beam_size: int,
               dtype=jnp.bfloat16, max_len: Optional[int] = None,
               audio_ctx: Optional[int] = None,
               int8_self_cache: bool = False) -> BeamState:
    G, K = n_groups, beam_size
    GK = G * K
    L, H = cfg.n_text_layer, cfg.n_text_head
    Dh = cfg.n_text_state // H
    T = max_len or cfg.n_text_ctx
    A = audio_ctx or cfg.n_audio_ctx
    sp = WhisperTokenizer(cfg.n_langs).special
    cache_dtype = jnp.int8 if int8_self_cache else dtype
    sshape = (L, GK, T, H) if int8_self_cache else (L, GK, 1, 1)
    return BeamState(
        cache_k=jnp.zeros((L, GK, T, H * Dh), cache_dtype),
        cache_v=jnp.zeros((L, GK, T, H * Dh), cache_dtype),
        cache_ks=jnp.zeros(sshape, jnp.float32),
        cache_vs=jnp.zeros(sshape, jnp.float32),
        xkv_k=jnp.zeros((L, G, A, H * Dh), jnp.int8),
        xkv_ks=jnp.zeros((L, G, A, H), jnp.float32),
        xkv_v=jnp.zeros((L, G, A, H * Dh), jnp.int8),
        xkv_vs=jnp.zeros((L, G, A, H), jnp.float32),
        tokens=jnp.full((G, K, T), sp.eot, jnp.int32),
        alive_lp=jnp.full((G, K), NEG_INF, jnp.float32),
        alive_len=jnp.zeros((G, K), jnp.int32),
        fin_scores=jnp.full((G, K), NEG_INF, jnp.float32),
        fin_tokens=jnp.full((G, K, T), sp.eot, jnp.int32),
        fin_lens=jnp.zeros((G, K), jnp.int32),
        ts_prev=jnp.zeros((G, K), bool),
        ts_prevprev=jnp.zeros((G, K), bool),
        ts_floor=jnp.full((G, K), sp.timestamp_begin, jnp.int32),
        use_ts=jnp.zeros((G,), bool),
        prompt_len=jnp.zeros((G,), jnp.int32),
        step=jnp.zeros((G,), jnp.int32),
        max_new=jnp.zeros((G,), jnp.int32),
        no_speech=jnp.zeros((G,), jnp.float32),
        last_logits=jnp.full((GK, cfg.n_vocab_padded), NEG_INF, jnp.float32),
        active=jnp.zeros((G,), bool),
        finished=jnp.zeros((G,), bool),
        temperature=jnp.zeros((G,), jnp.float32),
        rng=jnp.zeros((G, K, 2), jnp.uint32),
        done_row=jnp.zeros((G, K), bool),
        anc=jnp.zeros((G, K, K, T), bool),
    )


def state_bytes(cfg: WhisperConfig, n_groups: int, beam_size: int,
                dtype=jnp.bfloat16, max_len: Optional[int] = None,
                audio_ctx: Optional[int] = None,
                int8_self_cache: bool = False) -> int:
    """Exact device bytes init_state(...) will allocate (jax.eval_shape —
    can't drift from the allocation code). Beam groups are the
    HBM-heaviest state in the tree: G·K bf16 self-caches plus one int8
    cross-KV copy per group; the server budgeter sizes G against the
    chip."""
    import numpy as np
    shapes = jax.eval_shape(functools.partial(
        init_state, cfg, n_groups, beam_size, dtype=dtype,
        max_len=max_len, audio_ctx=audio_ctx,
        int8_self_cache=int8_self_cache))
    total = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree.leaves(shapes))
    if not whisper.beam_grouped_ok(cfg, beam_size):
        # Fallback formulation (K·H > one lane tile): every step dispatch
        # materializes a GK-tiled int8 cross-KV TRANSIENT alongside the
        # stored per-group copy (jnp.repeat in _step_impl) — peak memory
        # the stored-state walk above cannot see. Count the tiled copy.
        xkv_fields = ("xkv_k", "xkv_ks", "xkv_v", "xkv_vs")
        xkv_bytes = sum(
            int(np.prod(getattr(shapes, f).shape))
            * getattr(shapes, f).dtype.itemsize for f in xkv_fields)
        total += xkv_bytes * beam_size
    return total


def admit(cfg: WhisperConfig, params, state: BeamState, group: jax.Array,
          new_xkv: whisper.QuantKVCache, prompt: jax.Array,
          use_timestamps: jax.Array, *, prompt_len: int,
          max_new: jax.Array,
          temperature: Optional[jax.Array] = None,
          rng: Optional[jax.Array] = None,
          row: Optional[jax.Array] = None) -> BeamState:
    """Install one window as beam group `group` and prefill its prompt.

    new_xkv: a prepared batch of quantized cross-KV windows (the server's
    shared _prepare_many output) — `row` picks the window; it is tiled K
    ways into the group's rows. temperature == 0 → beam mode (only beam 0
    alive at start); > 0 → best-of-K sampling with per-row keys `rng`
    [K, 2]."""
    K = state.tokens.shape[1]
    if temperature is None:
        temperature = jnp.float32(0.0)
    if rng is None:
        rng = jnp.zeros((K, 2), jnp.uint32)
    if row is None:
        row = jnp.int32(0)
    donated, kept = _pack(state)
    return _admit_impl(cfg, params, donated, kept, jnp.int32(group),
                       new_xkv, prompt, jnp.asarray(use_timestamps),
                       jnp.float32(temperature),
                       jnp.asarray(rng, jnp.uint32).reshape(K, 2),
                       jnp.int32(row), jnp.int32(max_new),
                       prompt_len=prompt_len)


def readmit(cfg: WhisperConfig, params, state: BeamState, group: jax.Array,
            prompt: jax.Array, use_timestamps: jax.Array, *,
            prompt_len: int, max_new: jax.Array, temperature: jax.Array,
            rng: jax.Array) -> BeamState:
    """Re-prefill `group` from the cross-KV its rows already hold — the
    temperature-ladder retry (beam → best-of sampling), no re-encode."""
    K = state.tokens.shape[1]
    donated, kept = _pack(state)
    return _readmit_impl(cfg, params, donated, kept, jnp.int32(group),
                         prompt, jnp.asarray(use_timestamps),
                         jnp.float32(temperature),
                         jnp.asarray(rng, jnp.uint32).reshape(K, 2),
                         jnp.int32(max_new), prompt_len=prompt_len)


def _prefill_group(cfg, params, state: BeamState, group, row_xkv, prompt,
                   use_timestamps, temperature, rng, max_new,
                   prompt_len: int) -> BeamState:
    """Traced tail shared by admit/readmit. Expects the group's xkv rows
    to already hold the window (tiled); prefills ONE row and tiles the
    resulting cache + frontier logits K ways (beams are identical until
    the first expansion — beam.py:76-95 does the same prefill-then-tile)."""
    G, K, T = state.tokens.shape
    sp = WhisperTokenizer(cfg.n_langs).special
    base = group * K
    quant_self = state.cache_k.dtype == jnp.int8

    zrow = lambda buf: jnp.zeros_like(
        jax.lax.dynamic_slice_in_dim(buf, 0, 1, axis=1))
    zero_row = zrow(state.cache_k)
    if quant_self:
        row_cache = whisper.QuantKVCache(zero_row, zrow(state.cache_ks),
                                         zero_row, zrow(state.cache_vs))
    else:
        row_cache = whisper.KVCache(zero_row, zero_row)
    logits, row_cache = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                       row_cache, row_xkv)
    tile = lambda x: jnp.repeat(x, K, axis=1)
    putc = lambda buf, val: jax.lax.dynamic_update_slice(
        buf, val.astype(buf.dtype), (0, base, 0, 0))
    cache_k = putc(state.cache_k, tile(row_cache.k))
    cache_v = putc(state.cache_v, tile(row_cache.v))
    cache_ks, cache_vs = state.cache_ks, state.cache_vs
    if quant_self:
        cache_ks = putc(cache_ks, tile(row_cache.k_scale))
        cache_vs = putc(cache_vs, tile(row_cache.v_scale))

    sot_probs = jax.nn.softmax(logits[:, 0].astype(jnp.float32), -1)
    last = logits[0, -1].astype(jnp.float32)             # [V]
    last_logits = jax.lax.dynamic_update_slice(
        state.last_logits, jnp.broadcast_to(last, (K, last.shape[0])),
        (base, 0))

    tokens_g = jnp.full((1, K, T), sp.eot, jnp.int32)
    tokens_g = jax.lax.dynamic_update_slice(
        tokens_g, jnp.broadcast_to(prompt[:, None], (1, K, prompt_len)),
        (0, 0, 0))

    is_beam = temperature == 0.0
    # Beam: only beam 0 alive at start. Sampling: every row alive at 0.
    beam0 = jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32)
    alive0 = jnp.where(is_beam, beam0, jnp.zeros((K,), jnp.float32))

    setg = lambda a, v: jax.lax.dynamic_update_slice(
        a, jnp.asarray(v).astype(a.dtype).reshape((1,) + a.shape[1:]),
        (group,) + (0,) * (a.ndim - 1))
    return state._replace(
        cache_k=cache_k, cache_v=cache_v,
        cache_ks=cache_ks, cache_vs=cache_vs,
        tokens=jax.lax.dynamic_update_slice(state.tokens, tokens_g,
                                            (group, 0, 0)),
        alive_lp=setg(state.alive_lp, alive0),
        alive_len=setg(state.alive_len, jnp.zeros((K,), jnp.int32)),
        fin_scores=setg(state.fin_scores,
                        jnp.full((K,), NEG_INF, jnp.float32)),
        fin_tokens=jax.lax.dynamic_update_slice(
            state.fin_tokens, jnp.full((1, K, T), sp.eot, jnp.int32),
            (group, 0, 0)),
        fin_lens=setg(state.fin_lens, jnp.zeros((K,), jnp.int32)),
        ts_prev=setg(state.ts_prev, jnp.zeros((K,), bool)),
        ts_prevprev=setg(state.ts_prevprev, jnp.zeros((K,), bool)),
        ts_floor=setg(state.ts_floor,
                      jnp.full((K,), sp.timestamp_begin, jnp.int32)),
        use_ts=setg(state.use_ts, use_timestamps),
        last_logits=last_logits,
        prompt_len=setg(state.prompt_len, jnp.int32(prompt_len)),
        step=setg(state.step, jnp.int32(0)),
        max_new=setg(state.max_new, max_new),
        no_speech=setg(state.no_speech, sot_probs[0, sp.no_speech]),
        active=setg(state.active, True),
        finished=setg(state.finished, False),
        temperature=setg(state.temperature, temperature),
        rng=setg(state.rng, rng),
        done_row=setg(state.done_row, jnp.zeros((K,), bool)),
        # Prompt rows are tiled identical; each beam's ancestry points at
        # its own row for the prompt positions (equivalent content).
        anc=setg(state.anc,
                 jnp.eye(K, dtype=bool)[:, :, None]
                 & (jnp.arange(T)[None, None, :] < prompt_len)),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "prompt_len"),
                   donate_argnums=(2,))
def _admit_impl(cfg: WhisperConfig, params, donated, kept, group,
                new_xkv: whisper.QuantKVCache, prompt, use_timestamps,
                temperature, rng, row, max_new, *,
                prompt_len: int) -> BeamState:
    state = _unpack(donated, kept)
    pick = lambda a: jax.lax.dynamic_slice_in_dim(a, row, 1, axis=1)
    row_xkv = whisper.QuantKVCache(pick(new_xkv.k), pick(new_xkv.k_scale),
                                   pick(new_xkv.v), pick(new_xkv.v_scale))
    # ONE copy per group — the step shares it across the K beams.
    put = lambda buf, val: jax.lax.dynamic_update_slice(
        buf, val.astype(buf.dtype), (0, group) + (0,) * (buf.ndim - 2))
    state = state._replace(
        xkv_k=put(state.xkv_k, row_xkv.k),
        xkv_ks=put(state.xkv_ks, row_xkv.k_scale),
        xkv_v=put(state.xkv_v, row_xkv.v),
        xkv_vs=put(state.xkv_vs, row_xkv.v_scale))
    return _prefill_group(cfg, params, state, group, row_xkv, prompt,
                          use_timestamps, temperature, rng, max_new,
                          prompt_len)


@functools.partial(jax.jit, static_argnames=("cfg", "prompt_len"),
                   donate_argnums=(2,))
def _readmit_impl(cfg: WhisperConfig, params, donated, kept, group, prompt,
                  use_timestamps, temperature, rng, max_new, *,
                  prompt_len: int) -> BeamState:
    state = _unpack(donated, kept)
    pick = lambda a: jax.lax.dynamic_slice_in_dim(a, group, 1, axis=1)
    row_xkv = whisper.QuantKVCache(pick(state.xkv_k), pick(state.xkv_ks),
                                   pick(state.xkv_v), pick(state.xkv_vs))
    return _prefill_group(cfg, params, state, group, row_xkv, prompt,
                          use_timestamps, temperature, rng, max_new,
                          prompt_len)


def step(cfg: WhisperConfig, params, state: BeamState,
         suppress_mask: jax.Array, *, inner_steps: int = 8,
         max_initial_index: int = 50, blank_token: int = 220,
         length_penalty: Optional[float] = None) -> BeamState:
    """Advance every live group by `inner_steps` beam expansions (or
    sampling steps for T>0 groups). Groups whose stop condition fires
    freeze mid-dispatch — their final state is bit-identical to a B=1
    one-shot beam_search_loop exit."""
    donated, kept = _pack(state)
    return _step_impl(cfg, params, donated, kept, suppress_mask,
                      inner_steps=inner_steps,
                      max_initial_index=max_initial_index,
                      blank_token=blank_token,
                      length_penalty=length_penalty)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "inner_steps",
                                    "max_initial_index", "blank_token",
                                    "length_penalty"),
                   donate_argnums=(2,))
def _step_impl(cfg: WhisperConfig, params, donated, kept,
               suppress_mask: jax.Array, *, inner_steps: int,
               max_initial_index: int, blank_token: int,
               length_penalty: Optional[float]) -> BeamState:
    state = _unpack(donated, kept)
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    G, K, T = state.tokens.shape
    GK = G * K
    V = state.last_logits.shape[1]
    ids = jnp.arange(V)
    grouped = whisper.beam_grouped_ok(cfg, K)
    quant_self = state.cache_k.dtype == jnp.int8
    if grouped:
        # Ancestry-masked group step: shared cross-KV, no cache reorder
        # (model.decode_beam_step).
        xkv = whisper.QuantKVCache(state.xkv_k, state.xkv_ks,
                                   state.xkv_v, state.xkv_vs)
    else:
        # K·H exceeds one lane tile: fall back to the parent-gather
        # formulation with cross-KV tiled to GK rows once per dispatch
        # (loop-invariant across the inner scan).
        rep = lambda a: jnp.repeat(a, K, axis=1)
        xkv = whisper.QuantKVCache(rep(state.xkv_k), rep(state.xkv_ks),
                                   rep(state.xkv_v), rep(state.xkv_vs))

    def one_step(state, _):
        live = state.active & ~state.finished                   # [G]
        liver = jnp.repeat(live, K)                             # [GK]
        stepv = jnp.repeat(state.step, K)                       # [GK]
        ts_flat = (state.ts_prev.reshape(GK),
                   state.ts_prevprev.reshape(GK),
                   state.ts_floor.reshape(GK))
        lg = _filter_logits(state.last_logits,
                            suppress_mask=suppress_mask, length=stepv,
                            ts_state=ts_flat,
                            use_ts=jnp.repeat(state.use_ts, K), sp=sp,
                            ids=ids, max_initial_index=max_initial_index,
                            blank_token=blank_token)

        # Sampling candidates (rows of T>0 groups); logprobs shared with
        # the beam branch (one log_softmax).
        nxt_s, rng2, logprobs = _choose_tokens(
            lg, jnp.repeat(state.temperature, K), state.rng.reshape(GK, 2))

        # ---- beam expansion (beam.py:121-191 formulation) -------------
        lpg = logprobs.reshape(G, K, V)
        cand = state.alive_lp[:, :, None] + lpg
        top_lp, top_idx = jax.lax.top_k(cand.reshape(G, K * V), 2 * K)
        parent = top_idx // V                                   # [G, 2K]
        tok = (top_idx % V).astype(jnp.int32)
        is_eot_c = tok == eot
        new_len = jnp.take_along_axis(state.alive_len, parent, axis=1) + 1

        eot_scores = jnp.where(
            is_eot_c, _length_score(top_lp, new_len, length_penalty),
            NEG_INF)
        cand_tokens = _gather_beams({"t": state.tokens}, parent)["t"]
        all_scores = jnp.concatenate([state.fin_scores, eot_scores], axis=1)
        all_tokens = jnp.concatenate([state.fin_tokens, cand_tokens], axis=1)
        all_lens = jnp.concatenate(
            [state.fin_lens, jnp.where(is_eot_c, new_len - 1, 0)], axis=1)
        b_fin_scores, fin_idx = jax.lax.top_k(all_scores, K)
        b_fin_tokens = jnp.take_along_axis(all_tokens, fin_idx[:, :, None],
                                           axis=1)
        b_fin_lens = jnp.take_along_axis(all_lens, fin_idx, axis=1)

        alive_cand = jnp.where(is_eot_c, NEG_INF, top_lp)
        b_alive_lp, aidx = jax.lax.top_k(alive_cand, K)
        b_parent = jnp.take_along_axis(parent, aidx, axis=1)    # [G, K]
        b_tok = jnp.take_along_axis(tok, aidx, axis=1)
        b_len = jnp.take_along_axis(new_len, aidx, axis=1)

        # ---- best-of sampling rows (identity parents) ------------------
        done = state.done_row
        s_tok = jnp.where(done, eot, nxt_s.reshape(G, K))
        tok_lp = jnp.take_along_axis(
            logprobs, nxt_s[:, None], axis=-1)[:, 0].reshape(G, K)
        s_emit = ~done                       # EOT step itself still counts
        s_lp = state.alive_lp + jnp.where(s_emit, tok_lp, 0.0)
        s_len = state.alive_len + jnp.where(s_emit, 1, 0)
        s_done = done | (s_tok == eot)

        # ---- per-group branch select -----------------------------------
        is_beam = state.temperature == 0.0                      # [G]
        identity = jnp.broadcast_to(jnp.arange(K)[None], (G, K))
        sel = lambda b, s: jnp.where(is_beam[:, None], b, s)
        parent_sel = jnp.where((live & is_beam)[:, None], b_parent,
                               identity)
        tok_sel = sel(b_tok, s_tok)
        n_alive_lp = sel(b_alive_lp, s_lp)
        n_alive_len = sel(b_len, s_len)
        n_fin_scores = sel(b_fin_scores, state.fin_scores)
        n_fin_lens = sel(b_fin_lens, state.fin_lens)
        n_fin_tokens = jnp.where(is_beam[:, None, None], b_fin_tokens,
                                 state.fin_tokens)
        n_done = sel(state.done_row, s_done)
        n_rng = jnp.where((live & ~is_beam)[:, None, None],
                          rng2.reshape(G, K, 2), state.rng)

        # ---- freeze non-live groups ------------------------------------
        keep = lambda new, old: jnp.where(
            live.reshape((G,) + (1,) * (old.ndim - 1)), new, old)
        alive_lp = keep(n_alive_lp, state.alive_lp)
        alive_len = keep(n_alive_len, state.alive_len)
        fin_scores = keep(n_fin_scores, state.fin_scores)
        fin_tokens = keep(n_fin_tokens, state.fin_tokens)
        fin_lens = keep(n_fin_lens, state.fin_lens)
        done_row = keep(n_done, state.done_row)

        # ---- tokens: gather by parent, write at the group's column -----
        pos_g = state.prompt_len + state.step                   # [G]
        gathered = _gather_beams({"t": state.tokens}, parent_sel)["t"]
        written = jax.vmap(
            lambda rows, t, p: jax.lax.dynamic_update_slice(
                rows, t[:, None], (0, p)))(gathered, tok_sel, pos_g)
        tokens = keep(written, state.tokens)

        # ---- ts state: gather then update (frozen sampled rows keep) ---
        ts_g = _gather_beams(
            {"a": state.ts_prev, "b": state.ts_prevprev,
             "c": state.ts_floor}, parent_sel)
        ts_old = (ts_g["a"].reshape(GK), ts_g["b"].reshape(GK),
                  ts_g["c"].reshape(GK))
        new_ts = decoding._update_ts_state(ts_old, tok_sel.reshape(GK),
                                           sp_consts, stepv)
        # Beam rows always update (alive rows are never finished);
        # sampling rows freeze once done (greedy_loop parity).
        upd = liver & ~(jnp.repeat(~is_beam, K) & done.reshape(GK))
        ts_sel = jax.tree.map(lambda n, o: jnp.where(upd, n, o), new_ts,
                              ts_old)

        # ---- one decode step for all rows -------------------------------
        mkcache = lambda k, ks, v, vs: (
            whisper.QuantKVCache(k, ks, v, vs) if quant_self
            else whisper.KVCache(k, v))
        if grouped:
            # Inherit the parent's ancestry (this step's visibility),
            # then record each beam's own write at pos_g for the NEXT
            # step. The cache itself is never permuted.
            anc_att = jnp.take_along_axis(
                state.anc, parent_sel[:, :, None, None], axis=1)
            cache = mkcache(state.cache_k, state.cache_ks,
                            state.cache_v, state.cache_vs)
            logits3, cache = whisper.decode_beam_step(
                cfg, params, tok_sel, pos_g, cache,
                anc_att.reshape(G, K, K * T), xkv)
            logits_flat = logits3.reshape(GK, V)
            own = (jnp.eye(K, dtype=bool)[None, :, :, None]
                   & (jnp.arange(T)[None, None, None, :]
                      == pos_g[:, None, None, None]))
            anc = keep(anc_att | own, state.anc)
        else:
            flat_parent = (parent_sel
                           + jnp.arange(G)[:, None] * K).reshape(GK)
            gat = lambda a: a[:, flat_parent]
            cache = mkcache(gat(state.cache_k), gat(state.cache_ks),
                            gat(state.cache_v), gat(state.cache_vs))
            feed = tok_sel.reshape(GK)
            logits, cache = whisper.decode(cfg, params, feed[:, None],
                                           jnp.repeat(pos_g, K), cache,
                                           xkv)
            logits_flat = logits[:, -1]
            anc = state.anc
        last_logits = jnp.where(liver[:, None],
                                logits_flat.astype(jnp.float32),
                                state.last_logits)

        # ---- stop conditions (per group; beam.py:112-119 for B=1) ------
        step_new = state.step + jnp.where(live, 1, 0)
        slots_open = jnp.any(fin_scores <= NEG_INF / 2, axis=1)
        alive_ok = jnp.max(alive_lp, axis=1) > NEG_INF / 2
        cond_beam = slots_open & alive_ok
        cond_samp = ~jnp.all(done_row, axis=1)
        cont = ((step_new < state.max_new)
                & jnp.where(is_beam, cond_beam, cond_samp))
        finished = state.finished | (live & ~cont)

        cache_fields = (dict(cache_k=cache.k, cache_ks=cache.k_scale,
                             cache_v=cache.v, cache_vs=cache.v_scale)
                        if quant_self
                        else dict(cache_k=cache.k, cache_v=cache.v))
        return state._replace(
            **cache_fields, tokens=tokens,
            alive_lp=alive_lp, alive_len=alive_len,
            fin_scores=fin_scores, fin_tokens=fin_tokens,
            fin_lens=fin_lens,
            ts_prev=ts_sel[0].reshape(G, K),
            ts_prevprev=ts_sel[1].reshape(G, K),
            ts_floor=ts_sel[2].reshape(G, K),
            step=step_new, last_logits=last_logits, finished=finished,
            rng=n_rng, done_row=done_row, anc=anc), None

    state, _ = jax.lax.scan(one_step, state, None, length=inner_steps)
    return state


@jax.jit
def _release_impl(active, finished, group_mask):
    return active & ~group_mask, finished & ~group_mask


def release(state: BeamState, group_mask: jax.Array) -> BeamState:
    active, finished = _release_impl(state.active, state.finished,
                                     group_mask)
    return state._replace(active=active, finished=finished)


def best_hypothesis(tokens, alive_lp, alive_len, fin_scores, fin_tokens,
                    fin_lens, temperature, done_row,
                    length_penalty: Optional[float] = None):
    """Host-side harvest pick for ONE group (numpy inputs, [K, ...] rows).

    Beam (T=0): best finished hypothesis, falling back to the best alive
    beam when nothing finished (beam.py:205-211). Sampling (T>0): best
    row by length-normalized sum logprob, preferring rows that hit EOT.
    Returns (row_tokens [T], length, score)."""
    import numpy as np

    def lscore(slp, ln):
        ln = max(int(ln), 1)
        if length_penalty is None:
            return float(slp) / ln
        return float(slp) / (((5.0 + ln) / 6.0) ** length_penalty)

    if float(temperature) == 0.0:
        if fin_scores[0] > NEG_INF / 2:
            return fin_tokens[0], int(fin_lens[0]), float(fin_scores[0])
        return tokens[0], int(alive_len[0]), lscore(alive_lp[0],
                                                    alive_len[0])
    scores = np.asarray([lscore(alive_lp[r], alive_len[r])
                         for r in range(len(alive_lp))])
    # Prefer completed rows; budget-cut rows only if nothing completed.
    if done_row.any():
        scores = np.where(done_row, scores, -np.inf)
    r = int(scores.argmax())
    # Sampling rows record EOT in alive_len (greedy_loop counts the EOT
    # step); strip it from the content length.
    ln = int(alive_len[r]) - (1 if done_row[r] else 0)
    return tokens[r], max(ln, 0), float(scores[r])
