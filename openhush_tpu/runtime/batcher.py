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
    # Speculative serving (init_state(draft_cfg=...)): per-slot DRAFT
    # decoder state — self-cache + int8 cross-KV of the shallow draft
    # model that proposes K-token blocks for spec_step. [1,1,1,1]
    # placeholders when speculation is off.
    d_cache_k: jax.Array     # [Ld, B, T, H*Dh] draft self-cache
    d_cache_v: jax.Array
    d_xkv_k: jax.Array       # int8 [Ld, B, A, H*Dh] draft cross-KV
    d_xkv_ks: jax.Array
    d_xkv_v: jax.Array
    d_xkv_vs: jax.Array


# Extra rows past the logical decode budget when speculation is on: the
# verify pass writes K-token blocks at per-row offsets, and
# dynamic_update_slice clamps start indices — without headroom a block
# write at the budget edge would silently corrupt earlier KV entries.
SPEC_MARGIN = 16


def init_state(cfg: WhisperConfig, n_slots: int, dtype=jnp.bfloat16,
               int8_self_cache: bool = False,
               max_len: Optional[int] = None,
               audio_ctx: Optional[int] = None,
               draft_cfg: Optional[WhisperConfig] = None) -> SlotState:
    """audio_ctx < n_audio_ctx restricts the encoder context (whisper.cpp's
    audio_ctx speed knob): streaming daemons with short chunks size slots
    to ~chunk_secs*50*1.3, cutting the per-step cross-KV read 3-4x.

    draft_cfg: allocate draft-model state for speculative serving
    (spec_step). The draft must share the big model's width and vocab
    (the large-v3 / large-v3-turbo relationship); caches get SPEC_MARGIN
    extra rows so K-block writes never clamp."""
    B = n_slots
    L, H = cfg.n_text_layer, cfg.n_text_head
    Dh = cfg.n_text_state // H
    T = max_len or cfg.n_text_ctx
    if draft_cfg is not None:
        T += SPEC_MARGIN
    A = audio_ctx or cfg.n_audio_ctx
    sp = WhisperTokenizer(cfg.n_langs).special
    cache_dtype = jnp.int8 if int8_self_cache else dtype
    sshape = (L, B, T, H) if int8_self_cache else (L, B, 1, 1)
    if draft_cfg is not None:
        Ld = draft_cfg.n_text_layer
        dshape = (Ld, B, T, H * Dh)
        dxshape = (Ld, B, A, H * Dh)
        dsshape = (Ld, B, A, H)
    else:
        dshape = dxshape = dsshape = (1, 1, 1, 1)
    return SlotState(
        d_cache_k=jnp.zeros(dshape, dtype),
        d_cache_v=jnp.zeros(dshape, dtype),
        d_xkv_k=jnp.zeros(dxshape, jnp.int8),
        d_xkv_ks=jnp.zeros(dsshape, jnp.float32),
        d_xkv_v=jnp.zeros(dxshape, jnp.int8),
        d_xkv_vs=jnp.zeros(dsshape, jnp.float32),
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


def state_bytes(cfg: WhisperConfig, n_slots: int, dtype=jnp.bfloat16,
                int8_self_cache: bool = False,
                max_len: Optional[int] = None,
                audio_ctx: Optional[int] = None,
                draft_cfg: Optional[WhisperConfig] = None) -> int:
    """Exact device bytes init_state(...) will allocate, computed via
    jax.eval_shape so it can never drift from the allocation code. The
    HBM budgeter (server._check_hbm_budget) uses this to refuse slot
    counts that would RESOURCE_EXHAUSTED the chip mid-run — 'n_slots=32
    exhausts HBM' was folklore in a bench comment until round 4."""
    shapes = jax.eval_shape(functools.partial(
        init_state, cfg, n_slots, dtype=dtype,
        int8_self_cache=int8_self_cache, max_len=max_len,
        audio_ctx=audio_ctx, draft_cfg=draft_cfg))
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(shapes))


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
          row: Optional[jax.Array] = None,
          draft_cfg: Optional[WhisperConfig] = None,
          draft_params=None,
          draft_xkv: Optional[whisper.QuantKVCache] = None) -> SlotState:
    """Install a session into `slot` and prefill its prompt.

    new_xkv: quantized cross-KV ([L, k, A, H*Dh] int8 + [L, k, A, H]
    scales, flat layout) — `row` picks which of the k prepared windows to
    install (the prep path encodes joiners in batches; k=1, row=0 is the
    single-window case). prompt: [1, prompt_len]. temperature > 0
    switches the row to sampling with `rng` (the fallback ladder).
    draft_*: speculative serving — also install the draft model's
    cross-KV for this window and prefill its per-slot cache."""
    donated, kept = _pack(state)
    if temperature is None:
        temperature = jnp.float32(0.0)
    if rng is None:
        rng = jnp.zeros((2,), jnp.uint32)
    if row is None:
        row = jnp.int32(0)
    return _admit_impl(cfg, params, draft_cfg, draft_params, donated,
                       kept, slot, new_xkv, draft_xkv, prompt,
                       use_timestamps, temperature,
                       jnp.asarray(rng, jnp.uint32).reshape(2),
                       jnp.int32(row), prompt_len=prompt_len)


def readmit(cfg: WhisperConfig, params, state: SlotState, slot: jax.Array,
            prompt: jax.Array, use_timestamps: jax.Array, *,
            prompt_len: int, temperature: jax.Array,
            rng: jax.Array,
            draft_cfg: Optional[WhisperConfig] = None,
            draft_params=None) -> SlotState:
    """Re-prefill `slot` from the cross-KV it ALREADY holds — the
    temperature-fallback retry path. No re-encode, no host-side xkv
    reference kept alive."""
    donated, kept = _pack(state)
    return _readmit_impl(cfg, params, draft_cfg, draft_params, donated,
                         kept, slot, prompt, use_timestamps, temperature,
                         jnp.asarray(rng, jnp.uint32).reshape(2),
                         prompt_len=prompt_len)


def _prefill_row(cfg: WhisperConfig, params, state: SlotState,
                 slot: jax.Array, row_xkv: whisper.QuantKVCache,
                 prompt: jax.Array, use_timestamps: jax.Array,
                 temperature: jax.Array, rng: jax.Array,
                 prompt_len: int, draft_cfg=None,
                 draft_params=None) -> SlotState:
    """Traced tail shared by admit/readmit: zero the slot's self-cache,
    prefill the prompt against row_xkv, reset every per-slot scalar.
    Expects state.xkv_* (and d_xkv_* in speculative mode) to already
    hold the row's cross-KV."""
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

    d_cache_k, d_cache_v = state.d_cache_k, state.d_cache_v
    if draft_cfg is not None:
        # Draft prefill: the draft decoder tracks the big model's cache
        # fill token-for-token (spec_step keeps both at pos-1).
        d_cache_k = zero_slot(d_cache_k)
        d_cache_v = zero_slot(d_cache_v)
        drow_xkv = whisper.QuantKVCache(
            row_of(state.d_xkv_k), row_of(state.d_xkv_ks),
            row_of(state.d_xkv_v), row_of(state.d_xkv_vs))
        drow_cache = whisper.KVCache(row_of(d_cache_k), row_of(d_cache_v))
        _, drow_cache = whisper.decode(draft_cfg, draft_params, prompt,
                                       jnp.int32(0), drow_cache, drow_xkv)
        d_cache_k = put_row(d_cache_k, drow_cache.k)
        d_cache_v = put_row(d_cache_v, drow_cache.v)

    tokens_row = jnp.full((1, T), sp.eot, jnp.int32)
    tokens_row = jax.lax.dynamic_update_slice(tokens_row, prompt, (0, 0))
    set1 = lambda a, v: jax.lax.dynamic_update_slice(
        a, jnp.asarray(v).reshape((1,) + a.shape[1:]), (slot,) + (0,) * (a.ndim - 1))
    return state._replace(
        cache_k=cache_k, cache_v=cache_v,
        cache_ks=cache_ks, cache_vs=cache_vs,
        d_cache_k=d_cache_k, d_cache_v=d_cache_v,
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


@functools.partial(jax.jit,
                   static_argnames=("cfg", "draft_cfg", "prompt_len"),
                   donate_argnums=(4,))
def _admit_impl(cfg: WhisperConfig, params, draft_cfg, draft_params,
                donated, kept, slot: jax.Array,
                new_xkv: whisper.QuantKVCache,
                draft_xkv, prompt: jax.Array,
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
    if draft_cfg is not None:
        drow = whisper.QuantKVCache(
            pick(draft_xkv.k), pick(draft_xkv.k_scale),
            pick(draft_xkv.v), pick(draft_xkv.v_scale))
        state = state._replace(
            d_xkv_k=upd(state.d_xkv_k, drow.k),
            d_xkv_ks=upd(state.d_xkv_ks, drow.k_scale),
            d_xkv_v=upd(state.d_xkv_v, drow.v),
            d_xkv_vs=upd(state.d_xkv_vs, drow.v_scale))
    return _prefill_row(cfg, params, state, slot, row_xkv, prompt,
                        use_timestamps, temperature, rng, prompt_len,
                        draft_cfg=draft_cfg, draft_params=draft_params)


def admit_many(cfg: WhisperConfig, params, state: SlotState,
               slots, new_xkv: whisper.QuantKVCache, prompts,
               use_timestamps, *, prompt_len: int, temperatures, rngs,
               rows, draft_cfg: Optional[WhisperConfig] = None,
               draft_params=None,
               draft_xkv: Optional[whisper.QuantKVCache] = None
               ) -> SlotState:
    """Install k sessions from ONE prepared batch in ONE dispatch.

    Join bursts (and offline batch transcription) previously paid one
    admit dispatch per window; through a dev tunnel each dispatch costs
    ~tens of ms, making admission the serving bottleneck after the step
    loop was amortized. All k windows must share `new_xkv` (one
    _prepare_many batch) and prompt_len.

    slots/rows: [k] int32; prompts: [k, prompt_len]; use_timestamps:
    [k] bool; temperatures: [k] f32; rngs: [k, 2] uint32."""
    donated, kept = _pack(state)
    return _admit_many_impl(
        cfg, draft_cfg, params, draft_params, donated, kept,
        jnp.asarray(slots, jnp.int32), new_xkv, draft_xkv,
        jnp.asarray(prompts, jnp.int32),
        jnp.asarray(use_timestamps, bool),
        jnp.asarray(temperatures, jnp.float32),
        jnp.asarray(rngs, jnp.uint32),
        jnp.asarray(rows, jnp.int32), prompt_len=prompt_len)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "draft_cfg", "prompt_len"),
                   donate_argnums=(4,))
def _admit_many_impl(cfg: WhisperConfig, draft_cfg, params, draft_params,
                     donated, kept, slots, new_xkv, draft_xkv, prompts,
                     use_ts, temps, rngs, rows, *,
                     prompt_len: int) -> SlotState:
    state = _unpack(donated, kept)
    k = slots.shape[0]

    def body(i, state):
        slot, row = slots[i], rows[i]
        pick = lambda a: jax.lax.dynamic_slice_in_dim(a, row, 1, axis=1)
        row_xkv = whisper.QuantKVCache(
            pick(new_xkv.k), pick(new_xkv.k_scale),
            pick(new_xkv.v), pick(new_xkv.v_scale))
        upd = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val.astype(buf.dtype), (0, slot) + (0,) * (buf.ndim - 2))
        state = state._replace(
            xkv_k=upd(state.xkv_k, row_xkv.k),
            xkv_ks=upd(state.xkv_ks, row_xkv.k_scale),
            xkv_v=upd(state.xkv_v, row_xkv.v),
            xkv_vs=upd(state.xkv_vs, row_xkv.v_scale))
        if draft_cfg is not None:
            drow = whisper.QuantKVCache(
                pick(draft_xkv.k), pick(draft_xkv.k_scale),
                pick(draft_xkv.v), pick(draft_xkv.v_scale))
            state = state._replace(
                d_xkv_k=upd(state.d_xkv_k, drow.k),
                d_xkv_ks=upd(state.d_xkv_ks, drow.k_scale),
                d_xkv_v=upd(state.d_xkv_v, drow.v),
                d_xkv_vs=upd(state.d_xkv_vs, drow.v_scale))
        return _prefill_row(cfg, params, state, slot, row_xkv,
                            prompts[i][None], use_ts[i], temps[i],
                            rngs[i], prompt_len,
                            draft_cfg=draft_cfg,
                            draft_params=draft_params)

    return jax.lax.fori_loop(0, k, body, state)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "draft_cfg", "prompt_len"),
                   donate_argnums=(4,))
def _readmit_impl(cfg: WhisperConfig, params, draft_cfg, draft_params,
                  donated, kept,
                  slot: jax.Array, prompt: jax.Array,
                  use_timestamps: jax.Array, temperature: jax.Array,
                  rng: jax.Array, *, prompt_len: int) -> SlotState:
    state = _unpack(donated, kept)
    pick = lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
    row_xkv = whisper.QuantKVCache(pick(state.xkv_k), pick(state.xkv_ks),
                                   pick(state.xkv_v), pick(state.xkv_vs))
    return _prefill_row(cfg, params, state, slot, row_xkv, prompt,
                        use_timestamps, temperature, rng, prompt_len,
                        draft_cfg=draft_cfg, draft_params=draft_params)


def _filter_logits(lg, *, suppress_mask, length, ts_state, use_ts, sp,
                   ids, max_initial_index, blank_token):
    """The per-step [B, V] filter stack shared by the greedy and
    speculative step kernels (MUST stay identical — spec_step's
    token-exactness guarantee is 'same filters, same argmax')."""
    sp_consts = (sp.timestamp_begin, sp.eot)
    lg = jnp.where(suppress_mask[None, :], NEG_INF, lg)
    first = length == 0
    blank_mask = (ids == blank_token) | (ids == sp.eot)
    lg = jnp.where(first[:, None] & blank_mask[None, :], NEG_INF, lg)
    lg_ts = decoding._timestamp_filter(lg, sp_consts, ts_state, length,
                                       max_initial_index)
    is_ts = ids[None, :] >= sp.timestamp_begin
    lg = jnp.where(use_ts[:, None], lg_ts, lg)
    no_ts_mask = use_ts[:, None] | ~is_ts
    return jnp.where(no_ts_mask, lg, NEG_INF)


def _choose_tokens(lg, temperature, rng):
    """Greedy argmax, or per-row temperature sampling where temp > 0.
    Returns (token [B] int32, advanced rng [B, 2], logprobs [B, V])."""
    logprobs = jax.nn.log_softmax(lg, axis=-1)
    greedy = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    def sample_row(key_data, row_logits, row_temp):
        k1, k2 = jax.random.split(jax.random.wrap_key_data(key_data))
        tok = jax.random.categorical(
            k2, row_logits / jnp.maximum(row_temp, 1e-6))
        return jax.random.key_data(k1), tok

    new_rng, sampled = jax.vmap(sample_row)(rng, lg, temperature)
    nxt = jnp.where(temperature > 0, sampled.astype(jnp.int32), greedy)
    return nxt, new_rng, logprobs


def step(cfg: WhisperConfig, params, state: SlotState,
         suppress_mask: jax.Array, *, inner_steps: int = 8,
         max_initial_index: int = 50, blank_token: int = 220,
         rep_threshold: int = 12,
         room_cap: Optional[int] = None) -> SlotState:
    """Advance every active unfinished slot by `inner_steps` tokens (greedy,
    or sampled where the row's temperature > 0). A row whose last
    `rep_threshold` tokens all short-cycle (period 1 or 2) is finished early
    with `degenerate=True` — the device-side repetition guard.

    room_cap: explicit logical decode budget. REQUIRED for exactness when
    the state was allocated with draft_cfg (spec_policy="auto" runs plain
    steps on spec-margined buffers: deriving the limit from the buffer
    width would allow SPEC_MARGIN extra tokens). Defaults to the buffer
    width - 1."""
    donated, kept = _pack(state)
    return _step_impl(cfg, params, donated, kept, suppress_mask,
                      inner_steps=inner_steps,
                      max_initial_index=max_initial_index,
                      blank_token=blank_token, rep_threshold=rep_threshold,
                      room_cap=room_cap)


@functools.partial(jax.jit, static_argnames=("cfg", "inner_steps",
                                             "max_initial_index",
                                             "blank_token", "rep_threshold",
                                             "room_cap"),
                   donate_argnums=(2,))
def _step_impl(cfg: WhisperConfig, params, donated, kept,
               suppress_mask: jax.Array, *, inner_steps: int = 8,
               max_initial_index: int = 50,
               blank_token: int = 220, rep_threshold: int = 12,
               room_cap: Optional[int] = None) -> SlotState:
    state = _unpack(donated, kept)
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    B, T = state.tokens.shape
    V = state.last_logits.shape[1]
    ids = jnp.arange(V)

    def one_step(state, _):
        ts_state = (state.ts_prev, state.ts_prevprev, state.ts_floor)
        # The filter takes per-row decode clocks directly (continuous
        # batching: each slot is at its own step).
        lg = _filter_logits(state.last_logits,
                            suppress_mask=suppress_mask,
                            length=state.length, ts_state=ts_state,
                            use_ts=state.use_ts, sp=sp, ids=ids,
                            max_initial_index=max_initial_index,
                            blank_token=blank_token)
        # Per-row temperature sampling for the harvest-time fallback ladder
        # (whisper's retry-at-higher-temperature, engine one-shot parity).
        nxt, new_rng, logprobs = _choose_tokens(lg, state.temperature,
                                                state.rng)
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
        out_of_room = state.pos >= (T - 1 if room_cap is None
                                    else room_cap)
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


def spec_step(cfg: WhisperConfig, params, draft_cfg: WhisperConfig,
              draft_params, state: SlotState, suppress_mask: jax.Array, *,
              k_spec: int = 4, n_iters: int = 2, room_cap: int,
              max_initial_index: int = 50, blank_token: int = 220,
              rep_threshold: int = 12,
              force_accept: bool = False) -> SlotState:
    """Speculative twin of step(): advance every active slot by 1..k_spec
    tokens per iteration (n_iters iterations per dispatch).

    Each iteration the shared DRAFT decoder rolls k_spec proposals from
    every row's tip, the big model verifies the block in ONE decode pass,
    and each row accepts its big-model argmaxes until the first mismatch —
    so the big model's weight + KV reads are amortized over up to k_spec
    emitted tokens. Output is token-identical to step(): every emitted
    token is the big model's filtered argmax (or its temperature sample
    for ladder-retry rows, which accept exactly one token per iteration).

    Invariant between iterations: the newest emitted token ("tip",
    tokens[pos-1]) is NOT yet in either cache; cache fill == pos-1.
    Freshly admitted rows (length==0, frontier logits in last_logits)
    emit token #0 from last_logits first, entering the same invariant.

    room_cap: the logical decode budget (= non-spec max_len - 1); caches
    carry SPEC_MARGIN extra rows past it so K-block writes never clamp.

    No counterpart in the reference (whisper.cpp decodes strictly
    sequentially, src/engine/whisper.rs:204-305)."""
    if k_spec + room_cap + 1 > state.tokens.shape[1]:
        raise ValueError(
            f"k_spec={k_spec} needs {k_spec + room_cap + 1} rows but the "
            f"state has {state.tokens.shape[1]} (init_state(draft_cfg=...) "
            f"adds SPEC_MARGIN={SPEC_MARGIN})")
    donated, kept = _pack(state)
    return _spec_step_impl(cfg, draft_cfg, params, draft_params, donated,
                           kept, suppress_mask, k_spec=k_spec,
                           n_iters=n_iters, room_cap=room_cap,
                           max_initial_index=max_initial_index,
                           blank_token=blank_token,
                           rep_threshold=rep_threshold,
                           force_accept=force_accept)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "k_spec", "n_iters", "room_cap",
                     "max_initial_index", "blank_token", "rep_threshold",
                     "force_accept"),
    donate_argnums=(4,))
def _spec_step_impl(cfg: WhisperConfig, draft_cfg: WhisperConfig, params,
                    draft_params, donated, kept, suppress_mask, *,
                    k_spec: int, n_iters: int, room_cap: int,
                    max_initial_index: int, blank_token: int,
                    rep_threshold: int,
                    force_accept: bool = False) -> SlotState:
    state = _unpack(donated, kept)
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    K = k_spec
    B, _ = state.tokens.shape
    V = state.last_logits.shape[1]
    ids = jnp.arange(V)
    filt = functools.partial(_filter_logits, suppress_mask=suppress_mask,
                             sp=sp, ids=ids,
                             max_initial_index=max_initial_index,
                             blank_token=blank_token)

    def write_window(tok_row, offset, vals, mask):
        win = jax.lax.dynamic_slice(tok_row, (offset,), (K,))
        return jax.lax.dynamic_update_slice(
            tok_row, jnp.where(mask, vals, win), (offset,))

    def emit_bookkeeping(c, nxt, tok_lp, emit, clock):
        """Shared per-emitted-token state advance (ordering identical to
        step()'s one_step, with `emit` in the role of `live`)."""
        (ts, slp, length, pos, prev, prevprev, repc, deg, fin) = c
        is_text = (nxt != eot) & (nxt < sp.timestamp_begin)
        rep = emit & is_text & ((nxt == prev) | (nxt == prevprev))
        repc = jnp.where(emit, jnp.where(rep, repc + 1, 0), repc)
        deg_now = emit & (repc >= rep_threshold)
        deg = deg | deg_now
        prevprev = jnp.where(emit, prev, prevprev)
        prev = jnp.where(emit, nxt, prev)
        slp = slp + jnp.where(emit, tok_lp, 0.0)
        length = length + jnp.where(emit, 1, 0)
        new_ts = decoding._update_ts_state(ts, nxt, sp_consts, clock)
        ts = jax.tree.map(lambda n, o: jnp.where(emit, n, o), new_ts, ts)
        hit_eot = nxt == eot
        out_of_room = pos >= room_cap
        fin_now = emit & (hit_eot | out_of_room | deg_now)
        fin = fin | fin_now
        pos = pos + jnp.where(emit & ~fin_now, 1, 0)
        return ((ts, slp, length, pos, prev, prevprev, repc, deg, fin),
                deg_now, fin_now)

    def iteration(state, _):
        live = state.active & ~state.finished
        ts_state = (state.ts_prev, state.ts_prevprev, state.ts_floor)

        # --- fresh rows (length==0): emit token #0 from last_logits ----
        lg0 = filt(state.last_logits, length=state.length,
                   ts_state=ts_state, use_ts=state.use_ts)
        nxt0, rng0, lp0 = _choose_tokens(lg0, state.temperature, state.rng)
        fresh = live & (state.length == 0)
        tok_lp0 = jnp.take_along_axis(lp0, nxt0[:, None], -1)[:, 0]
        c = (ts_state, state.sum_logprob, state.length, state.pos,
             state.prev_tok, state.prevprev_tok, state.rep_count,
             state.degenerate, state.finished)
        c, _, _ = emit_bookkeeping(c, nxt0, tok_lp0, fresh, state.length)
        (ts_state, sum_lp, length, pos, prev, prevprev, repc, deg,
         fin) = c
        rng = jnp.where(fresh[:, None], rng0, state.rng)
        # Fresh token written at the OLD pos (pos advanced inside
        # bookkeeping for non-finishing rows).
        tokens = jax.vmap(
            lambda row, t, p, e: jnp.where(
                e, jax.lax.dynamic_update_slice(row, t[None], (p,)), row))(
            state.tokens, nxt0, state.pos, fresh)

        # All live rows now satisfy the tip invariant.
        live = state.active & ~fin
        fill = jnp.maximum(pos - 1, 0)
        tip = jnp.take_along_axis(tokens, fill[:, None], 1)[:, 0]

        # --- draft: K sequential proposals from the tip ----------------
        d_xkv = whisper.QuantKVCache(state.d_xkv_k, state.d_xkv_ks,
                                     state.d_xkv_v, state.d_xkv_vs)

        def draft_roll(carry, i):
            cur, dts, dck, dcv = carry
            lg, dcache = whisper.decode(
                draft_cfg, draft_params, cur[:, None], fill + i,
                whisper.KVCache(dck, dcv), d_xkv)
            lgf = filt(lg[:, -1].astype(jnp.float32), length=length + i,
                       ts_state=dts, use_ts=state.use_ts)
            nxt = jnp.argmax(lgf, axis=-1).astype(jnp.int32)
            dts = decoding._update_ts_state(dts, nxt, sp_consts,
                                            length + i)
            return (nxt, dts, dcache.k, dcache.v), nxt

        (_, _, d_ck, d_cv), props = jax.lax.scan(
            draft_roll, (tip, ts_state, state.d_cache_k, state.d_cache_v),
            jnp.arange(K))
        props = props.T                         # [B, K]

        # --- big-model verify: ONE pass over [tip, p1..p_{K-1}] --------
        block = jnp.concatenate([tip[:, None], props[:, :K - 1]], axis=1)
        xkv = whisper.QuantKVCache(state.xkv_k, state.xkv_ks,
                                   state.xkv_v, state.xkv_vs)
        vlogits, cache = whisper.decode(cfg, params, block, fill,
                                        _self_cache(state), xkv)
        vlogits = vlogits.astype(jnp.float32)   # [B, K, V]

        # --- sequential accept scan ([B, V] ops on present data),
        # unrolled over the small static K --------------------------------
        ok = jnp.ones(B, bool)
        c = (ts_state, sum_lp, length, pos, prev, prevprev, repc, deg,
             fin)
        trues, emits = [], []
        cur_rng = rng
        for i in range(K):
            ts_c, fin_c = c[0], c[8]
            lg = filt(vlogits[:, i], length=length + i, ts_state=ts_c,
                      use_ts=state.use_ts)
            nxt, rng2, lps = _choose_tokens(lg, state.temperature,
                                            cur_rng)
            tok_lp = jnp.take_along_axis(lps, nxt[:, None], -1)[:, 0]
            emit = ok & live & ~fin_c
            cur_rng = jnp.where(emit[:, None], rng2, cur_rng)
            c, deg_now, fin_now = emit_bookkeeping(c, nxt, tok_lp, emit,
                                                   length + i)
            # Chain continues only for greedy rows whose next fed token
            # (the draft's proposal) matches the verified one and whose
            # emission wasn't terminal.
            cont = (emit & ~fin_now & (state.temperature == 0)
                    & (nxt != eot))
            if force_accept:
                # BENCH-ONLY upper-bound mode (accept=1.0 endpoint):
                # the chain never breaks on mismatch, so contexts diverge
                # from greedy — never use outside throughput measurement.
                ok = cont if i < K - 1 else jnp.zeros(B, bool)
            else:
                ok = (cont & (props[:, i] == nxt) if i < K - 1
                      else jnp.zeros(B, bool))
            trues.append(nxt)
            emits.append(emit)
        trues = jnp.stack(trues, axis=1)        # [B, K]
        emits = jnp.stack(emits, axis=1)        # [B, K] bool
        (ts_state, sum_lp, length2, pos2, prev, prevprev, repc, deg,
         fin) = c

        tokens = jax.vmap(write_window)(tokens, pos, trues, emits)

        return state._replace(
            **_cache_fields(cache), d_cache_k=d_ck, d_cache_v=d_cv,
            tokens=tokens, pos=pos2, length=length2, sum_logprob=sum_lp,
            finished=fin, degenerate=deg, rng=cur_rng,
            prev_tok=prev, prevprev_tok=prevprev, rep_count=repc,
            ts_prev=ts_state[0], ts_prevprev=ts_state[1],
            ts_floor=ts_state[2]), None

    state, _ = jax.lax.scan(iteration, state, None, length=n_iters)
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
