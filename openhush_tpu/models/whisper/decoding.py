"""Whisper decoding: logit filters, jitted greedy/sampling loop, language ID.

Replicates whisper.cpp's decode-time heuristics (consumed by the reference at
src/engine/whisper.rs:204-305): non-speech token suppression, blank
suppression at the first step, paired-timestamp grammar, monotonic timestamps,
the timestamp-vs-text probability rule, and no-speech probability capture.

TPU-first: the whole autoregressive loop is ONE compiled XLA program
(`lax.while_loop` with early exit when every row has finished) over fixed
shapes — [B, n_ctx] token buffer, fixed-shape KV cache — so a decode step is a
single device dispatch regardless of batch composition. Filters are vectorized
[B, V] masks in fp32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig
from openhush_tpu.text.tokenizer import WhisperTokenizer

NEG_INF = float(np.finfo(np.float32).min)


@dataclasses.dataclass(frozen=True)
class DecodingOptions:
    task: str = "transcribe"               # "transcribe" | "translate"
    language: Optional[str] = None          # None → auto-detect
    temperature: float = 0.0
    beam_size: Optional[int] = None         # None → greedy
    patience: float = 1.0
    length_penalty: Optional[float] = None  # None → simple length average
    without_timestamps: bool = False
    max_initial_timestamp: float = 1.0
    suppress_blank: bool = True
    suppress_tokens: bool = True            # non-speech list
    max_new_tokens: int = 224               # half of n_text_ctx, whisper default


@dataclasses.dataclass
class DecodingResult:
    tokens: np.ndarray          # [B, T] including prompt, EOT-padded
    prompt_len: int
    avg_logprob: np.ndarray     # [B]
    no_speech_prob: np.ndarray  # [B]
    language: list[str]
    temperature: float = 0.0


def build_suppress_mask(tok: WhisperTokenizer, cfg: WhisperConfig,
                        opts: DecodingOptions) -> np.ndarray:
    """Static [V_padded] bool mask of always-suppressed ids (True=suppress).
    Mirrors whisper's SuppressTokens + sot-sequence suppression."""
    sp = tok.special
    mask = np.zeros(cfg.n_vocab_padded, dtype=bool)
    if opts.suppress_tokens:
        for t in tok.non_speech_tokens:
            mask[t] = True
    # Task/meta tokens are never sampled.
    for t in (sp.sot, sp.translate, sp.transcribe, sp.start_of_lm,
              sp.start_of_prev, sp.no_speech):
        mask[t] = True
    for l in range(sp.lang_base, sp.lang_base + sp.n_langs):
        mask[l] = True
    if opts.without_timestamps:
        mask[sp.timestamp_begin:] = True
    else:
        mask[sp.no_timestamps] = True
    mask[cfg.n_vocab:] = True  # vocab padding
    return mask


def _timestamp_filter(logits, sp_consts, state, step, max_initial_index):
    """Apply whisper's timestamp grammar to [B, V] fp32 logits.

    state: (prev_was_ts [B], prevprev_was_ts [B], ts_floor [B]) where ts_floor
    is the minimum allowed timestamp token id (monotonicity).
    step: scalar or per-row [B] sampled-token count (continuous batching
    runs per-row decode clocks).
    """
    ts_begin, eot = sp_consts
    B, V = logits.shape
    vocab_ids = jnp.arange(V)[None, :]                     # [1, V]
    is_ts = vocab_ids >= ts_begin
    prev_was_ts, prevprev_was_ts, ts_floor = state
    step = jnp.broadcast_to(jnp.asarray(step), (B,))
    # openai-whisper: penultimate_was_timestamp is True when fewer than
    # two tokens have been sampled (decoding.py ApplyTimestampRules), so
    # the step-0 initial timestamp forces *text* at step 1, not a pair.
    penult_was_ts = prevprev_was_ts | (step < 2)

    # Rule: after a timestamp pair → no timestamps; after a lone timestamp →
    # only timestamps or EOT.
    block_ts = (prev_was_ts & penult_was_ts)[:, None] & is_ts
    block_text = (prev_was_ts & ~penult_was_ts)[:, None] & (vocab_ids < eot)
    # Monotonic: timestamps below the floor are illegal.
    block_old_ts = is_ts & (vocab_ids < ts_floor[:, None])
    logits = jnp.where(block_ts | block_text | block_old_ts, NEG_INF, logits)

    # First sampled token must be a timestamp, capped at max_initial
    # (openai blocks everything below timestamp_begin here, EOT included).
    first = (step == 0)[:, None]
    init_block = (~is_ts) | (vocab_ids > ts_begin + max_initial_index)
    logits = jnp.where(first & init_block, NEG_INF, logits)

    # Probability rule: if p(any timestamp) > max p(text) → force timestamp.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts, logprobs, NEG_INF), axis=-1)      # [B]
    max_text = jnp.max(jnp.where(is_ts, NEG_INF, logprobs), axis=-1)
    # (openai blocks all ids below timestamp_begin here, EOT included.)
    force_ts = (ts_logprob > max_text)[:, None] & ~is_ts
    return jnp.where(force_ts, NEG_INF, logits)


def _update_ts_state(state, next_tok, sp_consts, step):
    ts_begin, _ = sp_consts
    prev_was_ts, prevprev_was_ts, ts_floor = state
    is_ts = next_tok >= ts_begin
    # openai floor semantics (timestamp_last in ApplyTimestampRules): a
    # *lone* timestamp keeps equality legal (its pair partner may repeat
    # it); a pair-completing timestamp — or the step-0 initial timestamp,
    # which openai's len<2 rule treats as already paired — moves the
    # floor past itself.
    exclusive = prev_was_ts | (step == 0)
    new_floor = jnp.where(
        is_ts, jnp.where(exclusive, next_tok + 1, next_tok), ts_floor)
    return (is_ts, prev_was_ts, jnp.maximum(ts_floor, new_floor))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "prompt_len", "max_new", "use_timestamps",
                     "suppress_blank", "max_initial_index", "blank_token",
                     "sot_index"))
def greedy_loop(cfg: WhisperConfig, params, cross_kv, cache,
                prompt: jax.Array, suppress_mask: jax.Array,
                temperature: jax.Array, rng: jax.Array, *,
                prompt_len: int, max_new: int, use_timestamps: bool,
                suppress_blank: bool, max_initial_index: int,
                blank_token: int, sot_index: int = 0):
    """One compiled program: prefill prompt, then AR greedy/sample steps until
    all rows emit EOT or max_new is reached.

    prompt: [B, prompt_len] int32. Returns (tokens [B, prompt_len+max_new],
    sum_logprobs [B], lengths [B], no_speech_prob [B]).
    """
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    B = prompt.shape[0]
    eot = sp.eot

    tokens = jnp.full((B, prompt_len + max_new), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

    logits, cache = whisper.decode(cfg, params, prompt, jnp.int32(0), cache,
                                   cross_kv)
    # no_speech prob read at the SOT position within the prompt.
    sot_probs = jax.nn.softmax(logits[:, sot_index].astype(jnp.float32),
                               axis=-1)
    no_speech_prob = sot_probs[:, sp.no_speech]
    last_logits = logits[:, -1].astype(jnp.float32)

    ts_state = (jnp.zeros(B, bool), jnp.zeros(B, bool),
                jnp.full(B, sp.timestamp_begin, jnp.int32))

    def cond(carry):
        step, _, _, finished, *_ = carry
        return (step < max_new) & ~jnp.all(finished)

    def body(carry):
        (step, tokens, last_logits, finished, sum_lp, lengths, ts_state,
         cache, rng) = carry
        lg = jnp.where(suppress_mask[None, :], NEG_INF, last_logits)
        if suppress_blank:
            first = step == 0
            blank_mask = (jnp.arange(lg.shape[1]) == blank_token) | \
                         (jnp.arange(lg.shape[1]) == eot)
            lg = jnp.where(first & blank_mask[None, :], NEG_INF, lg)
        if use_timestamps:
            lg = _timestamp_filter(lg, sp_consts, ts_state, step,
                                   max_initial_index)

        logprobs = jax.nn.log_softmax(lg, axis=-1)
        rng, sub = jax.random.split(rng)
        sampled = jax.random.categorical(sub, lg / jnp.maximum(temperature, 1e-6))
        greedy = jnp.argmax(lg, axis=-1)
        next_tok = jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
        next_tok = jnp.where(finished, eot, next_tok)

        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None],
                                     axis=-1)[:, 0]
        sum_lp = sum_lp + jnp.where(finished, 0.0, tok_lp)
        lengths = lengths + jnp.where(finished, 0, 1)
        ts_state = jax.tree.map(
            lambda new, old: jnp.where(finished, old, new),
            _update_ts_state(ts_state, next_tok, sp_consts, step), ts_state)
        finished = finished | (next_tok == eot)

        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tok[:, None], (0, prompt_len + step))
        logits, cache = whisper.decode(cfg, params, next_tok[:, None],
                                       jnp.int32(prompt_len) + step, cache,
                                       cross_kv)
        return (step + 1, tokens, logits[:, -1].astype(jnp.float32), finished,
                sum_lp, lengths, ts_state, cache, rng)

    init = (jnp.int32(0), tokens, last_logits, jnp.zeros(B, bool),
            jnp.zeros(B, jnp.float32), jnp.zeros(B, jnp.int32), ts_state,
            cache, rng)
    (_, tokens, _, _, sum_lp, lengths, _, _, _) = jax.lax.while_loop(
        cond, body, init)
    return tokens, sum_lp, lengths, no_speech_prob


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_language_logits(cfg: WhisperConfig, params, cross_kv):
    """One decoder step on [sot] → logits restricted to language tokens.
    Parity: full_lang_id_from_state (src/engine/whisper.rs:287)."""
    sp = WhisperTokenizer(cfg.n_langs).special
    B = cross_kv.k.shape[1]
    cache_dtype = (cross_kv.k.dtype if cross_kv.k.dtype != jnp.int8
                   else params["decoder"]["pos_emb"].dtype)
    cache = whisper.init_kv_cache(cfg, B, dtype=cache_dtype, max_len=8)
    prompt = jnp.full((B, 1), sp.sot, jnp.int32)
    logits, _ = whisper.decode(cfg, params, prompt, jnp.int32(0), cache,
                               cross_kv)
    lg = logits[:, 0].astype(jnp.float32)
    lang_ids = jnp.arange(sp.lang_base, sp.lang_base + sp.n_langs)
    lang_logits = lg[:, lang_ids]
    return jax.nn.softmax(lang_logits, axis=-1)


def detect_language(cfg: WhisperConfig, params, cross_kv,
                    tok: WhisperTokenizer) -> tuple[list[str], np.ndarray]:
    probs = np.asarray(detect_language_logits(cfg, params, cross_kv))
    idx = probs.argmax(axis=-1)
    return [tok.special.languages[i] for i in idx], probs


def decode_greedy(cfg: WhisperConfig, params, cross_kv,
                  tok: WhisperTokenizer, opts: DecodingOptions,
                  prompt_ids: Optional[list[int]] = None,
                  languages: Optional[list[str]] = None,
                  rng: Optional[jax.Array] = None) -> DecodingResult:
    """Host wrapper: build prompt + masks, run the compiled loop."""
    B = int(cross_kv.k.shape[1])
    language = opts.language or (languages[0] if languages else "en")
    sot_seq = tok.sot_sequence(language, opts.task,
                               timestamps=not opts.without_timestamps)
    prompt = list(prompt_ids or []) + sot_seq
    sot_index = len(prompt_ids or [])
    prompt_arr = np.tile(np.asarray(prompt, np.int32), (B, 1))
    suppress = jnp.asarray(build_suppress_mask(tok, cfg, opts))
    max_new = min(opts.max_new_tokens, cfg.n_text_ctx - len(prompt) - 1)
    # Right-size the cache: every decode step reads the whole [.., T, ..]
    # buffer, so T = prompt+max_new (tile-rounded), not n_text_ctx.
    cache_len = min(cfg.n_text_ctx,
                    ((len(prompt) + max_new + 63) // 64) * 64)
    cache_dtype = (cross_kv.k.dtype if cross_kv.k.dtype != jnp.int8
                   else params["decoder"]["pos_emb"].dtype)
    cache = whisper.init_kv_cache(cfg, B, dtype=cache_dtype,
                                  max_len=cache_len)
    blank = tok.encode(" ")
    blank_token = blank[0] if blank else 220
    tokens, sum_lp, lengths, no_speech = greedy_loop(
        cfg, params, cross_kv, cache, jnp.asarray(prompt_arr), suppress,
        jnp.float32(opts.temperature),
        rng if rng is not None else jax.random.PRNGKey(0),
        prompt_len=len(prompt), max_new=max_new,
        use_timestamps=not opts.without_timestamps,
        suppress_blank=opts.suppress_blank,
        max_initial_index=int(opts.max_initial_timestamp / 0.02),
        blank_token=int(blank_token), sot_index=sot_index)
    lengths = np.asarray(lengths)
    avg_lp = np.asarray(sum_lp) / np.maximum(lengths, 1)
    return DecodingResult(
        tokens=np.asarray(tokens), prompt_len=len(prompt),
        avg_logprob=avg_lp, no_speech_prob=np.asarray(no_speech),
        language=[language] * B, temperature=opts.temperature)
