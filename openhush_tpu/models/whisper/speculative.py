"""Speculative greedy decoding: a small draft decoder proposes, the big
model verifies — output is TOKEN-IDENTICAL to plain greedy.

Why this is the TPU-shaped win: the AR decode step is HBM-bound (every
token reads all decoder weights + KV). Verification feeds K tokens in ONE
decode pass, so the big model's weight read is amortized over up to K
emitted tokens; the draft pays per-token reads but is ~8x smaller
(large-v3-turbo's 4-layer decoder vs large-v3's 32, sharing the SAME
encoder — so drafting adds no second encoder pass, just a second set of
cross-KV projections over the same audio features).

Greedy-exactness: every emitted token is an argmax of the BIG model's
filtered logits — proposals only decide how many such argmaxes one
dispatch yields. The full whisper filter chain (suppress masks, blank
rule, paired-timestamp grammar: decoding.py:_timestamp_filter) runs per
verify position with the grammar state scanned along the proposal block,
so timestamps mode is exact too. A mismatching (even random-init) draft
degrades SPEED only, never output — tests exploit exactly that.

No counterpart in the reference (whisper.cpp decodes strictly
sequentially; src/engine/whisper.rs:204-305) — this is a beyond-parity
feature.

Measured cost model (tools/spec_bench.py, v5e, large-v3 target +
large-v3-turbo-shaped draft, B=1, K=5, bf16 + int8 cross-KV):
greedy 3.68 ms/token; one speculative iteration 7.57 ms. Speedup =
(1 + (K-1)*accept_rate) * 3.68 / 7.57 → breakeven at accept ≈ 0.26,
2.0x at 0.8, 2.3x at 0.95. turbo IS distilled from large-v3, so real
checkpoints sit in the high-accept regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig
from openhush_tpu.text.tokenizer import WhisperTokenizer

NEG_INF = decoding.NEG_INF


def _filter_chain(lg, suppress_mask, step, ts_state, sp_consts, *,
                  use_timestamps, suppress_blank, blank_token,
                  max_initial_index, eot):
    """The exact greedy_loop filter stack on [B, V] fp32 logits; `step`
    is the per-row sampled-token count."""
    lg = jnp.where(suppress_mask[None, :], NEG_INF, lg)
    if suppress_blank:
        first = (jnp.broadcast_to(jnp.asarray(step), lg.shape[:1]) == 0)
        ids = jnp.arange(lg.shape[1])
        blank_mask = (ids == blank_token) | (ids == eot)
        lg = jnp.where(first[:, None] & blank_mask[None, :], NEG_INF, lg)
    if use_timestamps:
        lg = decoding._timestamp_filter(lg, sp_consts, ts_state, step,
                                        max_initial_index)
    return lg


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "prompt_len", "max_new",
                     "use_timestamps", "suppress_blank",
                     "max_initial_index", "blank_token", "sot_index",
                     "k_spec"))
def speculative_greedy_loop(cfg: WhisperConfig, params,
                            draft_cfg: WhisperConfig, draft_params,
                            cross_kv, draft_xkv, cache, draft_cache,
                            prompt: jax.Array, suppress_mask: jax.Array,
                            *, prompt_len: int, max_new: int,
                            use_timestamps: bool, suppress_blank: bool,
                            max_initial_index: int, blank_token: int,
                            sot_index: int = 0, k_spec: int = 5):
    """Drop-in greedy_loop twin (same outputs: tokens [B, prompt_len +
    max_new], sum_logprobs, lengths, no_speech_prob), temperature-0 only.

    Invariant across iterations: both caches contain every emitted token
    EXCEPT the newest ("tip"); `n` counts emitted tokens per row. One
    iteration: the draft rolls K proposals forward from the tip, the big
    model verifies the block in one pass, and 1..K big-model argmaxes are
    emitted. Per-row decode clocks (vector pos) mean rows accept at
    different rates inside one program; stale cache entries past a row's
    pos are masked by decode()'s causal key mask, which makes "rollback"
    free."""
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    B = prompt.shape[0]
    K = k_spec
    L = prompt_len + max_new + K          # margin for block writes

    filt = functools.partial(
        _filter_chain, suppress_mask=suppress_mask, sp_consts=sp_consts,
        use_timestamps=use_timestamps, suppress_blank=suppress_blank,
        blank_token=blank_token, max_initial_index=max_initial_index,
        eot=eot)

    tokens = jnp.full((B, L), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

    # Prefill both models on the prompt (shared-position, scalar pos).
    logits, cache = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                   cache, cross_kv)
    _, draft_cache = whisper.decode(draft_cfg, draft_params, prompt,
                                    jnp.int32(0), draft_cache, draft_xkv)
    sot_probs = jax.nn.softmax(logits[:, sot_index].astype(jnp.float32),
                               axis=-1)
    no_speech_prob = sot_probs[:, sp.no_speech]

    # First token exactly as greedy_loop's step 0.
    ts_state = (jnp.zeros(B, bool), jnp.zeros(B, bool),
                jnp.full(B, sp.timestamp_begin, jnp.int32))
    lg0 = filt(logits[:, -1].astype(jnp.float32),
               step=jnp.zeros(B, jnp.int32), ts_state=ts_state)
    tip = jnp.argmax(lg0, axis=-1).astype(jnp.int32)
    lp0 = jnp.take_along_axis(jax.nn.log_softmax(lg0, -1),
                              tip[:, None], -1)[:, 0]
    ts_state = decoding._update_ts_state(ts_state, tip, sp_consts,
                                         jnp.zeros(B, jnp.int32))
    tokens = jax.lax.dynamic_update_slice(tokens, tip[:, None],
                                          (0, prompt_len))
    finished = tip == eot
    n = jnp.ones(B, jnp.int32)            # emitted count (incl. tip)
    sum_lp = lp0
    row = jnp.arange(B)

    def cond(carry):
        n, tip, tokens, finished, sum_lp, ts_state, cache, dcache = carry
        return ~jnp.all(finished | (n >= max_new))

    def body(carry):
        n, tip, tokens, finished, sum_lp, ts_state, cache, dcache = carry
        fed = prompt_len + n - 1          # per-row cache fill (=tokens fed)

        # --- draft: K sequential proposals from the tip -------------------
        def draft_step(c, i):
            cur, dts, dcache = c
            lg, dcache = whisper.decode(draft_cfg, draft_params,
                                        cur[:, None], fed + i, dcache,
                                        draft_xkv)
            lg = filt(lg[:, -1].astype(jnp.float32), step=n + i,
                      ts_state=dts)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            dts = decoding._update_ts_state(dts, nxt, sp_consts, n + i)
            return (nxt, dts, dcache), nxt

        (_, _, dcache), props = jax.lax.scan(
            draft_step, (tip, ts_state, dcache), jnp.arange(K))
        props = props.T                   # [B, K]: p1..pK (pK unused below)

        # --- big-model verify: one pass over [tip, p1..p_{K-1}] ----------
        block = jnp.concatenate([tip[:, None], props[:, :K - 1]], axis=1)
        vlogits, cache = whisper.decode(cfg, params, block, fed, cache,
                                        cross_kv)
        vlogits = vlogits.astype(jnp.float32)     # [B, K, V]

        # --- sequential accept scan (cheap [B,V] ops on present data) ----
        def verify_step(c, i):
            ok, ts, tip_run, cnt, slp = c
            lg = filt(vlogits[:, i], step=n + i, ts_state=ts)
            true_i = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            lp_i = jnp.take_along_axis(jax.nn.log_softmax(lg, -1),
                                       true_i[:, None], -1)[:, 0]
            emit = ok & ~finished & (n + i < max_new)
            ts = jax.tree.map(
                lambda new, old: jnp.where(emit, new, old),
                decoding._update_ts_state(ts, true_i, sp_consts, n + i),
                ts)
            tip_run = jnp.where(emit, true_i, tip_run)
            cnt = cnt + emit.astype(jnp.int32)
            slp = slp + jnp.where(emit, lp_i, 0.0)
            # Continue accepting only while the next proposal matches and
            # this emission wasn't terminal.
            prop_i = jnp.where(i < K - 1, props[:, jnp.minimum(i + 1,
                                                               K - 1)], -1)
            ok = emit & (true_i != eot) & (prop_i == true_i)
            return (ok, ts, tip_run, cnt, slp), (true_i, emit)

        init = (jnp.ones(B, bool), ts_state, tip, jnp.zeros(B, jnp.int32),
                jnp.zeros(B, jnp.float32))
        (ok, ts_state, tip_next, cnt, slp), (trues, emits) = jax.lax.scan(
            verify_step, init, jnp.arange(K))
        trues = trues.T                   # [B, K]
        emits = emits.T                   # [B, K] bool

        # --- write the emitted window at per-row offsets ------------------
        def write_row(tok_row, offset, vals, mask):
            win = jax.lax.dynamic_slice(tok_row, (offset,), (K,))
            return jax.lax.dynamic_update_slice(
                tok_row, jnp.where(mask, vals, win), (offset,))

        tokens = jax.vmap(write_row)(tokens, prompt_len + n, trues, emits)

        new_finished = finished | jnp.any(emits & (trues == eot), axis=1)
        n = n + cnt
        new_finished = new_finished | (n >= max_new)
        sum_lp = sum_lp + slp
        return (n, tip_next, tokens, new_finished, sum_lp, ts_state,
                cache, dcache)

    (n, tip, tokens, finished, sum_lp, ts_state, cache, draft_cache) = \
        jax.lax.while_loop(cond, body, (n, tip, tokens, finished, sum_lp,
                                        ts_state, cache, draft_cache))
    del row
    return (tokens[:, :prompt_len + max_new], sum_lp, n, no_speech_prob)


def decode_speculative(cfg: WhisperConfig, params,
                       draft_cfg: WhisperConfig, draft_params,
                       cross_kv, draft_xkv, tok: WhisperTokenizer,
                       opts: decoding.DecodingOptions,
                       prompt_ids=None, languages=None,
                       k_spec: int = 5) -> decoding.DecodingResult:
    """Host wrapper mirroring decoding.decode_greedy (same option
    handling, cache sizing + K margin); temperature must be 0."""
    import numpy as np

    B = int(cross_kv.k.shape[1])
    language = opts.language or (languages[0] if languages else "en")
    sot_seq = tok.sot_sequence(language, opts.task,
                               timestamps=not opts.without_timestamps)
    prompt = list(prompt_ids or []) + sot_seq
    sot_index = len(prompt_ids or [])
    prompt_arr = np.tile(np.asarray(prompt, np.int32), (B, 1))
    suppress = jnp.asarray(decoding.build_suppress_mask(tok, cfg, opts))
    max_new = min(opts.max_new_tokens, cfg.n_text_ctx - len(prompt) - 1)
    # The verify pass writes K-token blocks at per-row offset
    # fed = prompt_len + n - 1, reaching prompt_len + max_new + K - 2 in
    # the worst case.  The cache must cover that WITHOUT an n_text_ctx
    # clamp: jax.lax.dynamic_update_slice clamps start indices, so an
    # undersized cache would silently overwrite earlier KV entries and
    # break the token-identical-to-greedy guarantee at the tail of
    # max-length decodes (long prev-context prompts hit this).
    cache_len = ((len(prompt) + max_new + k_spec + 63) // 64) * 64
    cache_dtype = (cross_kv.k.dtype if cross_kv.k.dtype != jnp.int8
                   else params["decoder"]["pos_emb"].dtype)
    cache = whisper.init_kv_cache(cfg, B, dtype=cache_dtype,
                                  max_len=cache_len)
    d_dtype = (draft_xkv.k.dtype if draft_xkv.k.dtype != jnp.int8
               else draft_params["decoder"]["pos_emb"].dtype)
    draft_cache = whisper.init_kv_cache(draft_cfg, B, dtype=d_dtype,
                                        max_len=cache_len)
    blank = tok.encode(" ")
    blank_token = blank[0] if blank else 220
    tokens, sum_lp, lengths, no_speech = speculative_greedy_loop(
        cfg, params, draft_cfg, draft_params, cross_kv, draft_xkv,
        cache, draft_cache, jnp.asarray(prompt_arr), suppress,
        prompt_len=len(prompt), max_new=max_new,
        use_timestamps=not opts.without_timestamps,
        suppress_blank=opts.suppress_blank,
        max_initial_index=int(opts.max_initial_timestamp / 0.02),
        blank_token=int(blank_token), sot_index=sot_index,
        k_spec=k_spec)
    lengths = np.asarray(lengths)
    avg_lp = np.asarray(sum_lp) / np.maximum(lengths, 1)
    return decoding.DecodingResult(
        tokens=np.asarray(tokens), prompt_len=len(prompt),
        avg_logprob=avg_lp, no_speech_prob=np.asarray(no_speech),
        language=[language] * B, temperature=0.0)
