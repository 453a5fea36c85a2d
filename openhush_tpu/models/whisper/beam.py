"""Jittable beam-search decoding (whisper's BeamSearchDecoder equivalent).

Used for quality-critical paths (large-v3 translate mode — baseline config
#4). Structure follows the standard alive/finished formulation (as in
flax/t5x): each step expands K alive beams over the vocab, keeps the top 2K
candidates (so an all-EOT row can't starve the alive set), routes EOT
candidates into the finished set with length-penalized scores, and gathers
the KV cache by parent-beam index. The whole loop is one XLA while_loop; the
timestamp/suppression filters from decoding.py apply per beam row with their
state gathered on reorder.

whisper.cpp parity: greedy fallback heuristics live in engine.py; this module
matches openai/whisper's beam semantics (patience, length penalty) which
whisper.cpp's beam mode mirrors (beam candidates by sum-logprob, EOT ends a
beam).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper import decoding
from openhush_tpu.models.whisper.config import WhisperConfig
from openhush_tpu.text.tokenizer import WhisperTokenizer

NEG_INF = decoding.NEG_INF


def _length_score(sum_lp, length, length_penalty: Optional[float]):
    """Whisper: None → average logprob; else GoogleNMT ((5+L)/6)^p."""
    length = jnp.maximum(length, 1)
    if length_penalty is None:
        return sum_lp / length
    return sum_lp / (((5.0 + length) / 6.0) ** length_penalty)


def _gather_beams(tree, parent_idx):
    """Gather [B, K, ...] leaves along beam dim by parent_idx [B, K]."""
    return jax.tree.map(
        lambda x: jnp.take_along_axis(
            x, parent_idx.reshape(parent_idx.shape + (1,) * (x.ndim - 2)),
            axis=1),
        tree)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "beam_size", "prompt_len", "max_new",
                     "use_timestamps", "suppress_blank", "max_initial_index",
                     "blank_token", "sot_index", "length_penalty"))
def beam_search_loop(cfg: WhisperConfig, params, cross_kv, prompt,
                     suppress_mask, *, beam_size: int, prompt_len: int,
                     max_new: int, use_timestamps: bool, suppress_blank: bool,
                     max_initial_index: int, blank_token: int,
                     sot_index: int = 0,
                     length_penalty: Optional[float] = None):
    """prompt [B, prompt_len] → (tokens [B, L], scores [B], no_speech [B]).

    Returns the best finished sequence per batch row (or best alive if none
    finished), with prompt included and EOT padding after the sequence end.
    """
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    B = prompt.shape[0]
    K = beam_size
    L = prompt_len + max_new
    V = cfg.n_vocab_padded

    # --- prefill on B rows, then tile to B*K ---
    act_dtype = params["decoder"]["pos_emb"].dtype
    cache_dtype = (cross_kv.k.dtype if cross_kv.k.dtype != jnp.int8
                   else act_dtype)
    cache0 = whisper.init_kv_cache(cfg, B, dtype=cache_dtype)
    logits0, cache0 = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                     cache0, cross_kv)
    sot_probs = jax.nn.softmax(logits0[:, sot_index].astype(jnp.float32), -1)
    no_speech_prob = sot_probs[:, sp.no_speech]
    last_logits = jnp.repeat(logits0[:, -1].astype(jnp.float32), K, axis=0)

    def tile(x):  # [L?, B, ...] cache/kv layout has batch at axis 1
        return jnp.repeat(x, K, axis=1)

    cache = whisper.KVCache(tile(cache0.k), tile(cache0.v))
    # K·H ≤ 128: ancestry-masked group step (model.decode_beam_step) —
    # ONE shared cross-KV copy per row and NO physical cache reorder on
    # beam switches (the row gather cost ~40% of the serving beam step;
    # tools/beam_step_components.py). Larger K falls back to tiling +
    # parent-gather.
    grouped = whisper.beam_grouped_ok(cfg, K)
    if grouped:
        xkv = cross_kv
    elif isinstance(cross_kv, whisper.QuantKVCache):
        xkv = whisper.QuantKVCache(tile(cross_kv.k), tile(cross_kv.k_scale),
                                   tile(cross_kv.v), tile(cross_kv.v_scale))
    else:
        xkv = whisper.KVCache(tile(cross_kv.k), tile(cross_kv.v))
    # Ancestry: each tiled prompt row belongs to its own beam. Tc is the
    # CACHE length (n_text_ctx), not the token-buffer length L. The
    # fallback (gather) formulation never reads it — carry a scalar
    # placeholder there instead of a dead B·K²·Tc bool tensor.
    Tc = cache.k.shape[2]
    if grouped:
        anc0 = jnp.broadcast_to(
            jnp.eye(K, dtype=bool)[None, :, :, None]
            & (jnp.arange(Tc)[None, None, None, :] < prompt_len),
            (B, K, K, Tc))
    else:
        anc0 = jnp.zeros((), bool)

    tokens = jnp.full((B, K, L), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, jnp.broadcast_to(prompt[:, None], (B, K, prompt_len)),
        (0, 0, 0))
    # Only beam 0 is alive at start (all beams identical otherwise).
    alive_lp = jnp.tile(jnp.asarray([[0.0] + [NEG_INF] * (K - 1)],
                                    jnp.float32), (B, 1))
    alive_len = jnp.zeros((B, K), jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF, jnp.float32)
    fin_tokens = jnp.full((B, K, L), eot, jnp.int32)
    fin_lens = jnp.zeros((B, K), jnp.int32)

    ts_state = (jnp.zeros((B, K), bool), jnp.zeros((B, K), bool),
                jnp.full((B, K), sp.timestamp_begin, jnp.int32))

    def cond(carry):
        step, _, alive_lp, _, fin_scores, *_ = carry
        # whisper-style stopping: run until every finished slot is populated
        # (K completed hypotheses collected) or the step budget is spent;
        # also stop if the alive set is exhausted (all-EOT expansion).
        slots_open = jnp.any(fin_scores <= NEG_INF / 2)
        alive_ok = jnp.max(alive_lp) > NEG_INF / 2
        return (step < max_new) & slots_open & alive_ok

    def body(carry):
        (step, tokens, alive_lp, alive_len, fin_scores, fin_tokens, fin_lens,
         ts_state, cache, last_logits, anc) = carry

        lg = last_logits.reshape(B, K, V)
        lg = jnp.where(suppress_mask[None, None, :], NEG_INF, lg)
        if suppress_blank:
            first = step == 0
            ids = jnp.arange(V)
            blank_mask = (ids == blank_token) | (ids == eot)
            lg = jnp.where(first & blank_mask[None, None, :], NEG_INF, lg)
        if use_timestamps:
            flat_state = jax.tree.map(lambda x: x.reshape(B * K), ts_state)
            lg = decoding._timestamp_filter(
                lg.reshape(B * K, V), sp_consts, flat_state, step,
                max_initial_index).reshape(B, K, V)

        logprobs = jax.nn.log_softmax(lg, axis=-1)       # [B, K, V]
        cand_lp = alive_lp[:, :, None] + logprobs        # [B, K, V]

        # Top 2K candidates over all beams.
        flat = cand_lp.reshape(B, K * V)
        top_lp, top_idx = jax.lax.top_k(flat, 2 * K)     # [B, 2K]
        parent = top_idx // V
        tok = (top_idx % V).astype(jnp.int32)
        is_eot = tok == eot
        new_len = jnp.take_along_axis(alive_len, parent, axis=1) + 1

        # --- update finished set with EOT candidates ---
        eot_scores = jnp.where(
            is_eot, _length_score(top_lp, new_len, length_penalty), NEG_INF)
        cand_tokens = _gather_beams({"t": tokens}, parent)["t"]
        # (EOT is already the pad value, so no token write needed.)
        all_scores = jnp.concatenate([fin_scores, eot_scores], axis=1)
        all_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        all_lens = jnp.concatenate(
            [fin_lens, jnp.where(is_eot, new_len - 1, 0)], axis=1)
        fin_top, fin_idx = jax.lax.top_k(all_scores, K)
        fin_scores = fin_top
        fin_tokens = jnp.take_along_axis(all_tokens, fin_idx[:, :, None],
                                         axis=1)
        fin_lens = jnp.take_along_axis(all_lens, fin_idx, axis=1)

        # --- pick top K non-EOT as the new alive set ---
        alive_cand_lp = jnp.where(is_eot, NEG_INF, top_lp)
        alive_top, alive_idx = jax.lax.top_k(alive_cand_lp, K)
        alive_lp = alive_top
        alive_parent = jnp.take_along_axis(parent, alive_idx, axis=1)
        alive_tok = jnp.take_along_axis(tok, alive_idx, axis=1)
        alive_len = jnp.take_along_axis(new_len, alive_idx, axis=1)

        tokens = _gather_beams({"t": tokens}, alive_parent)["t"]
        tokens = jax.lax.dynamic_update_slice(
            tokens, alive_tok[:, :, None], (0, 0, prompt_len + step))

        # Reorder per-beam decode state.
        ts_state = _gather_beams(
            {"a": ts_state[0], "b": ts_state[1], "c": ts_state[2]},
            alive_parent)
        ts_state = (ts_state["a"], ts_state["b"], ts_state["c"])
        flat_next = alive_tok.reshape(B * K)
        new_ts = decoding._update_ts_state(
            jax.tree.map(lambda x: x.reshape(B * K), ts_state), flat_next,
            sp_consts, step)
        ts_state = jax.tree.map(lambda x: x.reshape(B, K), new_ts)

        pos = jnp.full((B,), prompt_len, jnp.int32) + step
        if grouped:
            # Inherit the parent's ancestry; the cache is never permuted.
            anc = jnp.take_along_axis(
                anc, alive_parent[:, :, None, None], axis=1)
            logits3, cache = whisper.decode_beam_step(
                cfg, params, alive_tok, pos, cache,
                anc.reshape(B, K, K * Tc), xkv)
            last = logits3.reshape(B * K, V)
            anc = anc | (jnp.eye(K, dtype=bool)[None, :, :, None]
                         & (jnp.arange(Tc)[None, None, None, :]
                            == pos[:, None, None, None]))
        else:
            # Gather cache rows (flat index = b*K + parent).
            flat_parent = (alive_parent
                           + jnp.arange(B)[:, None] * K).reshape(B * K)
            cache = whisper.KVCache(cache.k[:, flat_parent],
                                    cache.v[:, flat_parent])
            logits, cache = whisper.decode(
                cfg, params, flat_next[:, None],
                jnp.int32(prompt_len) + step, cache, xkv)
            last = logits[:, -1]
        return (step + 1, tokens, alive_lp, alive_len, fin_scores,
                fin_tokens, fin_lens, ts_state, cache,
                last.astype(jnp.float32), anc)

    init = (jnp.int32(0), tokens, alive_lp, alive_len, fin_scores,
            fin_tokens, fin_lens, ts_state, cache, last_logits, anc0)
    (_, tokens, alive_lp, alive_len, fin_scores, fin_tokens, fin_lens, _,
     _, _, _) = jax.lax.while_loop(cond, body, init)

    # If nothing finished for a row, fall back to the best alive beam.
    alive_scores = _length_score(alive_lp, alive_len, length_penalty)
    no_fin = fin_scores[:, 0] <= NEG_INF / 2
    best_tokens = jnp.where(no_fin[:, None], tokens[:, 0], fin_tokens[:, 0])
    best_scores = jnp.where(no_fin, alive_scores[:, 0], fin_scores[:, 0])
    best_lens = jnp.where(no_fin, alive_len[:, 0], fin_lens[:, 0])
    return best_tokens, best_scores, best_lens, no_speech_prob


def decode_beam(cfg: WhisperConfig, params, cross_kv,
                tok: WhisperTokenizer, opts: decoding.DecodingOptions,
                prompt_ids: Optional[list[int]] = None,
                languages: Optional[list[str]] = None) -> decoding.DecodingResult:
    """Host wrapper mirroring decoding.decode_greedy."""
    B = int(cross_kv.k.shape[1])
    language = opts.language or (languages[0] if languages else "en")
    sot_seq = tok.sot_sequence(language, opts.task,
                               timestamps=not opts.without_timestamps)
    prompt = list(prompt_ids or []) + sot_seq
    sot_index = len(prompt_ids or [])
    prompt_arr = np.tile(np.asarray(prompt, np.int32), (B, 1))
    suppress = jnp.asarray(decoding.build_suppress_mask(tok, cfg, opts))
    max_new = min(opts.max_new_tokens, cfg.n_text_ctx - len(prompt) - 1)
    blank = tok.encode(" ")
    tokens, scores, lengths, no_speech = beam_search_loop(
        cfg, params, cross_kv, jnp.asarray(prompt_arr), suppress,
        beam_size=opts.beam_size or 5, prompt_len=len(prompt),
        max_new=max_new, use_timestamps=not opts.without_timestamps,
        suppress_blank=opts.suppress_blank,
        max_initial_index=int(opts.max_initial_timestamp / 0.02),
        blank_token=int(blank[0] if blank else 220), sot_index=sot_index,
        length_penalty=opts.length_penalty)
    return decoding.DecodingResult(
        tokens=np.asarray(tokens), prompt_len=len(prompt),
        avg_logprob=np.asarray(scores), no_speech_prob=np.asarray(no_speech),
        language=[language] * B, temperature=0.0)
