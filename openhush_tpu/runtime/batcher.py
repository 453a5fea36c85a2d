"""Continuous batching across concurrent capture sessions.

THE structural difference from the reference: whisper.cpp serializes jobs
through one worker thread (src/queue/worker.rs:255 — one engine, one job at a
time); here one persistent compiled decode step advances EVERY active session
by one token per dispatch, with admission and eviction happening *between*
steps at fixed shapes — no recompilation, no per-session graphs.

Device state (all fixed-shape; donated through the step kernel except the
peek-readable tokens/pos tape — see _PEEK_FIELDS). KV uses the FLAT
head-contiguous layout (whisper.KVCache) so each decode step scores all
heads with one MXU dot per row:
  cache [L, B, n_ctx, H*Dh]    per-slot self-attention KV
  xkv   [L, B, A, H*Dh] int8   per-slot cross-attention KV (+ [L,B,A,H]
                               per-(position, head) scales)
  tokens [B, n_ctx]            prompt + generated ids
  pos [B] / length [B]         per-row decode offsets (decode() vector-pos)
  last_logits [B, V]           carried between dispatches
  ts_state, finished, active   per-row decode-rule state

Admission = encode window (separate jit) → write one slot (jit, donated) →
prefill that row. The step kernel runs `inner_steps` tokens per dispatch to
amortize host↔device latency while keeping admission latency bounded.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig
from openhush_tpu.text.tokenizer import WhisperTokenizer

NEG_INF = decoding.NEG_INF


class SlotState(NamedTuple):
    cache_k: jax.Array
    cache_v: jax.Array
    # Self-cache scales [L, B, T, H] — meaningful only in int8-self-cache
    # mode (init_state(int8_self_cache=True)); [L, B, 1, 1] placeholders
    # otherwise.
    cache_ks: jax.Array
    cache_vs: jax.Array
    xkv_k: jax.Array          # int8 [L, B, A, H*Dh] (flat layout)
    xkv_ks: jax.Array         # f32  [L, B, A, H] per-(position, head) scales
    xkv_v: jax.Array
    xkv_vs: jax.Array
    tokens: jax.Array        # [B, n_ctx] int32
    pos: jax.Array           # [B] int32 — next cache write offset
    prompt_len: jax.Array    # [B] int32
    length: jax.Array        # [B] int32 — generated tokens so far
    sum_logprob: jax.Array   # [B] f32
    no_speech: jax.Array     # [B] f32
    last_logits: jax.Array   # [B, V] f32
    active: jax.Array        # [B] bool
    finished: jax.Array      # [B] bool
    ts_prev: jax.Array       # [B] bool
    ts_prevprev: jax.Array   # [B] bool
    ts_floor: jax.Array      # [B] int32
    use_ts: jax.Array        # [B] bool — per-session timestamps flag
    # Streaming quality guards (parity: whisper.cpp applies the whisper
    # heuristic ladder per chunk, src/engine/whisper.rs:204-305; here the
    # repetition detector runs ON DEVICE so a looping slot aborts mid-window
    # instead of streaming garbage until the buffer fills).
    temperature: jax.Array   # [B] f32 — 0 = greedy, >0 = sampling
    rng: jax.Array           # [B, 2] uint32 per-row PRNG keys
    prev_tok: jax.Array      # [B] int32 last sampled token
    prevprev_tok: jax.Array  # [B] int32
    rep_count: jax.Array     # [B] int32 consecutive short-cycle repeats
    degenerate: jax.Array    # [B] bool — aborted by the repetition guard


def init_state(cfg: WhisperConfig, n_slots: int, dtype=jnp.bfloat16,
               int8_self_cache: bool = False,
               max_len: Optional[int] = None,
               audio_ctx: Optional[int] = None) -> SlotState:
    """audio_ctx < n_audio_ctx restricts the encoder context (whisper.cpp's
    audio_ctx speed knob): streaming daemons with short chunks size slots
    to ~chunk_secs*50*1.3, cutting the per-step cross-KV read 3-4x."""
    B = n_slots
    L, H = cfg.n_text_layer, cfg.n_text_head
    Dh = cfg.n_text_state // H
    T = max_len or cfg.n_text_ctx
    A = audio_ctx or cfg.n_audio_ctx
    sp = WhisperTokenizer(cfg.n_langs).special
    cache_dtype = jnp.int8 if int8_self_cache else dtype
    sshape = (L, B, T, H) if int8_self_cache else (L, B, 1, 1)
    return SlotState(
        cache_k=jnp.zeros((L, B, T, H * Dh), cache_dtype),
        cache_v=jnp.zeros((L, B, T, H * Dh), cache_dtype),
        cache_ks=jnp.zeros(sshape, jnp.float32),
        cache_vs=jnp.zeros(sshape, jnp.float32),
        # Cross-KV slots are ALWAYS int8 (halves the dominant per-step read
        # and doubles session capacity; argmax-identical output).
        xkv_k=jnp.zeros((L, B, A, H * Dh), jnp.int8),
        xkv_ks=jnp.zeros((L, B, A, H), jnp.float32),
        xkv_v=jnp.zeros((L, B, A, H * Dh), jnp.int8),
        xkv_vs=jnp.zeros((L, B, A, H), jnp.float32),
        tokens=jnp.full((B, T), sp.eot, jnp.int32),
        pos=jnp.zeros((B,), jnp.int32),
        prompt_len=jnp.zeros((B,), jnp.int32),
        length=jnp.zeros((B,), jnp.int32),
        sum_logprob=jnp.zeros((B,), jnp.float32),
        no_speech=jnp.zeros((B,), jnp.float32),
        last_logits=jnp.full((B, cfg.n_vocab_padded), NEG_INF, jnp.float32),
        active=jnp.zeros((B,), bool),
        finished=jnp.zeros((B,), bool),
        ts_prev=jnp.zeros((B,), bool),
        ts_prevprev=jnp.zeros((B,), bool),
        ts_floor=jnp.full((B,), sp.timestamp_begin, jnp.int32),
        use_ts=jnp.zeros((B,), bool),
        temperature=jnp.zeros((B,), jnp.float32),
        rng=jnp.zeros((B, 2), jnp.uint32),
        prev_tok=jnp.full((B,), -1, jnp.int32),
        prevprev_tok=jnp.full((B,), -1, jnp.int32),
        rep_count=jnp.zeros((B,), jnp.int32),
        degenerate=jnp.zeros((B,), bool),
    )


# `tokens` and `pos` are deliberately excluded from buffer donation: they are
# the host-readable decode tape that EngineServer.peek() reads from arbitrary
# threads while the device loop runs. Donating them would delete the buffers
# a concurrent peek holds a reference to (the round-1 retry-on-RuntimeError
# race); keeping them undonated makes peek deterministic for the cost of one
# tiny [B, n_ctx] int32 copy per dispatch.
_PEEK_FIELDS = ("tokens", "pos")
_DONATED_FIELDS = tuple(f for f in SlotState._fields if f not in _PEEK_FIELDS)


def _self_cache(state: SlotState):
    """SlotState fields → the decode() self-cache (int8 mode carries
    per-(position, head) scales)."""
    if state.cache_k.dtype == jnp.int8:
        return whisper.QuantKVCache(state.cache_k, state.cache_ks,
                                    state.cache_v, state.cache_vs)
    return whisper.KVCache(state.cache_k, state.cache_v)


def _cache_fields(cache) -> dict:
    """decode()'s returned cache → SlotState._replace kwargs."""
    if isinstance(cache, whisper.QuantKVCache):
        return dict(cache_k=cache.k, cache_ks=cache.k_scale,
                    cache_v=cache.v, cache_vs=cache.v_scale)
    return dict(cache_k=cache.k, cache_v=cache.v)


def _pack(state: SlotState):
    return (tuple(getattr(state, f) for f in _DONATED_FIELDS),
            (state.tokens, state.pos))


def _unpack(donated, kept) -> SlotState:
    return SlotState(tokens=kept[0], pos=kept[1],
                     **dict(zip(_DONATED_FIELDS, donated)))


def admit(cfg: WhisperConfig, params, state: SlotState, slot: jax.Array,
          new_xkv: whisper.QuantKVCache, prompt: jax.Array,
          use_timestamps: jax.Array, *, prompt_len: int,
          temperature: Optional[jax.Array] = None,
          rng: Optional[jax.Array] = None,
          row: Optional[jax.Array] = None) -> SlotState:
    """Install a session into `slot` and prefill its prompt.

    new_xkv: quantized cross-KV ([L, k, A, H*Dh] int8 + [L, k, A, H]
    scales, flat layout) — `row` picks which of the k prepared windows to
    install (the prep path encodes joiners in batches; k=1, row=0 is the
    single-window case). prompt: [1, prompt_len]. temperature > 0
    switches the row to sampling with `rng` (the fallback ladder)."""
    donated, kept = _pack(state)
    if temperature is None:
        temperature = jnp.float32(0.0)
    if rng is None:
        rng = jnp.zeros((2,), jnp.uint32)
    if row is None:
        row = jnp.int32(0)
    return _admit_impl(cfg, params, donated, kept, slot, new_xkv, prompt,
                       use_timestamps, temperature,
                       jnp.asarray(rng, jnp.uint32).reshape(2),
                       jnp.int32(row), prompt_len=prompt_len)


def readmit(cfg: WhisperConfig, params, state: SlotState, slot: jax.Array,
            prompt: jax.Array, use_timestamps: jax.Array, *,
            prompt_len: int, temperature: jax.Array,
            rng: jax.Array) -> SlotState:
    """Re-prefill `slot` from the cross-KV it ALREADY holds — the
    temperature-fallback retry path. No re-encode, no host-side xkv
    reference kept alive."""
    donated, kept = _pack(state)
    return _readmit_impl(cfg, params, donated, kept, slot, prompt,
                         use_timestamps, temperature,
                         jnp.asarray(rng, jnp.uint32).reshape(2),
                         prompt_len=prompt_len)


def _prefill_row(cfg: WhisperConfig, params, state: SlotState,
                 slot: jax.Array, row_xkv: whisper.QuantKVCache,
                 prompt: jax.Array, use_timestamps: jax.Array,
                 temperature: jax.Array, rng: jax.Array,
                 prompt_len: int) -> SlotState:
    """Traced tail shared by admit/readmit: zero the slot's self-cache,
    prefill the prompt against row_xkv, reset every per-slot scalar.
    Expects state.xkv_* to already hold the row's cross-KV."""
    sp = WhisperTokenizer(cfg.n_langs).special
    T = state.tokens.shape[1]
    quant_self = state.cache_k.dtype == jnp.int8

    def zero_slot(buf):
        row = jnp.zeros_like(
            jax.lax.dynamic_slice_in_dim(buf, 0, 1, axis=1))
        return jax.lax.dynamic_update_slice(buf, row, (0, slot, 0, 0))

    row_of = lambda buf: jax.lax.dynamic_slice_in_dim(buf, slot, 1,
                                                      axis=1)
    put_row = lambda buf, row: jax.lax.dynamic_update_slice(
        buf, row.astype(buf.dtype), (0, slot, 0, 0))

    cache_k = zero_slot(state.cache_k)
    cache_v = zero_slot(state.cache_v)
    cache_ks, cache_vs = state.cache_ks, state.cache_vs
    if quant_self:
        cache_ks = zero_slot(cache_ks)
        cache_vs = zero_slot(cache_vs)
        row_cache = whisper.QuantKVCache(
            row_of(cache_k), row_of(cache_ks),
            row_of(cache_v), row_of(cache_vs))
    else:
        row_cache = whisper.KVCache(row_of(cache_k), row_of(cache_v))

    # Prefill this row alone.
    logits, row_cache = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                       row_cache, row_xkv)
    cache_k = put_row(cache_k, row_cache.k)
    cache_v = put_row(cache_v, row_cache.v)
    if quant_self:
        cache_ks = put_row(cache_ks, row_cache.k_scale)
        cache_vs = put_row(cache_vs, row_cache.v_scale)
    sot_probs = jax.nn.softmax(logits[:, 0].astype(jnp.float32), -1)

    tokens_row = jnp.full((1, T), sp.eot, jnp.int32)
    tokens_row = jax.lax.dynamic_update_slice(tokens_row, prompt, (0, 0))
    set1 = lambda a, v: jax.lax.dynamic_update_slice(
        a, jnp.asarray(v).reshape((1,) + a.shape[1:]), (slot,) + (0,) * (a.ndim - 1))
    return state._replace(
        cache_k=cache_k, cache_v=cache_v,
        cache_ks=cache_ks, cache_vs=cache_vs,
        tokens=jax.lax.dynamic_update_slice(state.tokens, tokens_row,
                                            (slot, 0)),
        pos=set1(state.pos, jnp.int32(prompt_len)),
        prompt_len=set1(state.prompt_len, jnp.int32(prompt_len)),
        length=set1(state.length, jnp.int32(0)),
        sum_logprob=set1(state.sum_logprob, jnp.float32(0)),
        no_speech=set1(state.no_speech, sot_probs[0, sp.no_speech]),
        last_logits=set1(state.last_logits,
                         logits[0, -1].astype(jnp.float32)),
        active=set1(state.active, True),
        finished=set1(state.finished, False),
        ts_prev=set1(state.ts_prev, False),
        ts_prevprev=set1(state.ts_prevprev, False),
        ts_floor=set1(state.ts_floor, jnp.int32(sp.timestamp_begin)),
        use_ts=set1(state.use_ts, use_timestamps),
        temperature=set1(state.temperature, temperature),
        rng=set1(state.rng, rng),
        prev_tok=set1(state.prev_tok, jnp.int32(-1)),
        prevprev_tok=set1(state.prevprev_tok, jnp.int32(-1)),
        rep_count=set1(state.rep_count, jnp.int32(0)),
        degenerate=set1(state.degenerate, False),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "prompt_len"),
                   donate_argnums=(2,))
def _admit_impl(cfg: WhisperConfig, params, donated, kept, slot: jax.Array,
                new_xkv: whisper.QuantKVCache, prompt: jax.Array,
                use_timestamps: jax.Array, temperature: jax.Array,
                rng: jax.Array, row: jax.Array, *,
                prompt_len: int) -> SlotState:
    state = _unpack(donated, kept)
    pick = lambda a: jax.lax.dynamic_slice_in_dim(a, row, 1, axis=1)
    row_xkv = whisper.QuantKVCache(pick(new_xkv.k), pick(new_xkv.k_scale),
                                   pick(new_xkv.v), pick(new_xkv.v_scale))
    upd = lambda buf, val: jax.lax.dynamic_update_slice(
        buf, val.astype(buf.dtype),
        (0, slot) + (0,) * (buf.ndim - 2))
    state = state._replace(
        xkv_k=upd(state.xkv_k, row_xkv.k),
        xkv_ks=upd(state.xkv_ks, row_xkv.k_scale),
        xkv_v=upd(state.xkv_v, row_xkv.v),
        xkv_vs=upd(state.xkv_vs, row_xkv.v_scale))
    return _prefill_row(cfg, params, state, slot, row_xkv, prompt,
                        use_timestamps, temperature, rng, prompt_len)


@functools.partial(jax.jit, static_argnames=("cfg", "prompt_len"),
                   donate_argnums=(2,))
def _readmit_impl(cfg: WhisperConfig, params, donated, kept,
                  slot: jax.Array, prompt: jax.Array,
                  use_timestamps: jax.Array, temperature: jax.Array,
                  rng: jax.Array, *, prompt_len: int) -> SlotState:
    state = _unpack(donated, kept)
    pick = lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
    row_xkv = whisper.QuantKVCache(pick(state.xkv_k), pick(state.xkv_ks),
                                   pick(state.xkv_v), pick(state.xkv_vs))
    return _prefill_row(cfg, params, state, slot, row_xkv, prompt,
                        use_timestamps, temperature, rng, prompt_len)


def step(cfg: WhisperConfig, params, state: SlotState,
         suppress_mask: jax.Array, *, inner_steps: int = 8,
         max_initial_index: int = 50, blank_token: int = 220,
         rep_threshold: int = 12) -> SlotState:
    """Advance every active unfinished slot by `inner_steps` tokens (greedy,
    or sampled where the row's temperature > 0). A row whose last
    `rep_threshold` tokens all short-cycle (period 1 or 2) is finished early
    with `degenerate=True` — the device-side repetition guard."""
    donated, kept = _pack(state)
    return _step_impl(cfg, params, donated, kept, suppress_mask,
                      inner_steps=inner_steps,
                      max_initial_index=max_initial_index,
                      blank_token=blank_token, rep_threshold=rep_threshold)


@functools.partial(jax.jit, static_argnames=("cfg", "inner_steps",
                                             "max_initial_index",
                                             "blank_token", "rep_threshold"),
                   donate_argnums=(2,))
def _step_impl(cfg: WhisperConfig, params, donated, kept,
               suppress_mask: jax.Array, *, inner_steps: int = 8,
               max_initial_index: int = 50,
               blank_token: int = 220, rep_threshold: int = 12) -> SlotState:
    state = _unpack(donated, kept)
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    B, T = state.tokens.shape
    V = state.last_logits.shape[1]
    ids = jnp.arange(V)

    def one_step(state, _):
        lg = jnp.where(suppress_mask[None, :], NEG_INF, state.last_logits)
        first = state.length == 0
        blank_mask = (ids == blank_token) | (ids == eot)
        lg = jnp.where(first[:, None] & blank_mask[None, :], NEG_INF, lg)

        ts_state = (state.ts_prev, state.ts_prevprev, state.ts_floor)
        # The filter takes per-row decode clocks directly (continuous
        # batching: each slot is at its own step).
        lg_ts = decoding._timestamp_filter(
            lg, sp_consts, ts_state, state.length, max_initial_index)
        is_ts = ids[None, :] >= sp.timestamp_begin
        lg = jnp.where(state.use_ts[:, None], lg_ts, lg)
        no_ts_mask = state.use_ts[:, None] | ~is_ts
        lg = jnp.where(no_ts_mask, lg, NEG_INF)  # suppress ts if disabled

        logprobs = jax.nn.log_softmax(lg, axis=-1)
        greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        # Per-row temperature sampling for the harvest-time fallback ladder
        # (whisper's retry-at-higher-temperature, engine one-shot parity).
        def sample_row(key_data, row_logits, row_temp):
            k1, k2 = jax.random.split(jax.random.wrap_key_data(key_data))
            tok = jax.random.categorical(
                k2, row_logits / jnp.maximum(row_temp, 1e-6))
            return jax.random.key_data(k1), tok
        new_rng, sampled = jax.vmap(sample_row)(state.rng, lg,
                                                state.temperature)
        sampled = sampled.astype(jnp.int32)
        nxt = jnp.where(state.temperature > 0, sampled, greedy)
        live = state.active & ~state.finished
        nxt = jnp.where(live, nxt, eot)
        rng = jnp.where(live[:, None], new_rng, state.rng)

        # Device-side repetition guard: consecutive period-1/2 cycles of
        # text tokens. Longer phrase loops are caught at harvest by the
        # compression-ratio check.
        is_text = (nxt != eot) & (nxt < sp.timestamp_begin)
        rep = live & is_text & ((nxt == state.prev_tok)
                                | (nxt == state.prevprev_tok))
        rep_count = jnp.where(live, jnp.where(rep, state.rep_count + 1, 0),
                              state.rep_count)
        degenerate_now = live & (rep_count >= rep_threshold)
        degenerate = state.degenerate | degenerate_now
        prevprev_tok = jnp.where(live, state.prev_tok, state.prevprev_tok)
        prev_tok = jnp.where(live, nxt, state.prev_tok)

        tok_lp = jnp.take_along_axis(logprobs, nxt[:, None], -1)[:, 0]
        sum_lp = state.sum_logprob + jnp.where(live, tok_lp, 0.0)
        length = state.length + jnp.where(live, 1, 0)

        new_ts = decoding._update_ts_state(ts_state, nxt, sp_consts,
                                           state.length)
        keep = lambda new, old: jnp.where(live, new, old)
        ts_prev = keep(new_ts[0], state.ts_prev)
        ts_prevprev = keep(new_ts[1], state.ts_prevprev)
        ts_floor = keep(new_ts[2], state.ts_floor)

        hit_eot = nxt == eot
        out_of_room = state.pos >= T - 1
        finished = state.finished | (live & (hit_eot | out_of_room
                                             | degenerate_now))

        # Write token at per-row pos (only live rows advance).
        tokens = jax.vmap(
            lambda row, t, p: jax.lax.dynamic_update_slice(row, t[None],
                                                           (p,)))(
            state.tokens, nxt, state.pos)
        tokens = jnp.where(live[:, None], tokens, state.tokens)

        cache = _self_cache(state)
        xkv = whisper.QuantKVCache(state.xkv_k, state.xkv_ks,
                                   state.xkv_v, state.xkv_vs)
        logits, cache = whisper.decode(cfg, params, nxt[:, None], state.pos,
                                       cache, xkv)
        pos = state.pos + jnp.where(live & ~finished, 1, 0)

        return state._replace(
            **_cache_fields(cache), tokens=tokens, pos=pos,
            length=length, sum_logprob=sum_lp,
            last_logits=logits[:, -1].astype(jnp.float32),
            finished=finished, ts_prev=ts_prev, ts_prevprev=ts_prevprev,
            ts_floor=ts_floor, rng=rng, prev_tok=prev_tok,
            prevprev_tok=prevprev_tok, rep_count=rep_count,
            degenerate=degenerate), None

    state, _ = jax.lax.scan(one_step, state, None, length=inner_steps)
    return state


@jax.jit
def _release_impl(active, finished, slot_mask):
    return active & ~slot_mask, finished & ~slot_mask


def release(state: SlotState, slot_mask: jax.Array) -> SlotState:
    """Mark slots in slot_mask [B] bool as free. Touches only the two [B]
    bool flags — every large buffer (and the peek-readable tokens/pos tape)
    is passed through untouched, so no donation and no copies."""
    active, finished = _release_impl(state.active, state.finished, slot_mask)
    return state._replace(active=active, finished=finished)
