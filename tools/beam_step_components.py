"""Ablation profiler for the beam-serving inner step (beam_batcher.step).

The beam step at G=4, K=5 (large-v3, max_len=144) measures ~12.7 ms per
inner step on v5e — far above the ~6 ms its HBM cost model predicts after
the group-shared cross-KV change. Each inner step runs entirely inside one
lax.scan dispatch, so per-step times here are true device time (the
standalone-op route is useless: sub-ms ops disappear under the ~3 ms
axon-tunnel dispatch floor).

Variants (each a structural copy of the GATHER-formulation step with one
piece ablated; `production` times the real beam_batcher.step, which since
round 4 is the ancestry-masked grouped step — beam_batcher.py is the
source of truth):
  production  the real serving step (ancestry-masked, no cache reorder)
  full        complete gather-formulation step
  no_filter   logit filters (suppression/timestamp grammar) skipped
  no_lsm      log_softmax replaced by raw logits (candidate math bogus,
              shapes identical)
  no_topk     beam expansion replaced by identity parents + argmax token
              (skips both top_k calls, keeps log_softmax + filters)
  no_gather   parent KV gather skipped (cache used as-is; semantics wrong,
              bandwidth honest)
  decode_only identity parents, argmax tokens, no filters/lsm/topk/gather

Run on-chip:  python tools/beam_step_components.py [--model large-v3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp")))

import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.beam import _gather_beams, _length_score
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.runtime import beam_batcher
from openhush_tpu.runtime.batcher import _choose_tokens, _filter_logits
from openhush_tpu.text.tokenizer import WhisperTokenizer

NEG_INF = decoding.NEG_INF


@functools.partial(jax.jit,
                   static_argnames=("cfg", "inner_steps", "ablate"),
                   donate_argnums=(1,))
def step_ablated(cfg, donated, kept, suppress_mask, *, inner_steps: int,
                 ablate: frozenset, params):
    """beam_batcher._step_impl copy with pieces switchable off."""
    state = beam_batcher._unpack(donated, kept)
    sp = WhisperTokenizer(cfg.n_langs).special
    sp_consts = (sp.timestamp_begin, sp.eot)
    eot = sp.eot
    G, K, T = state.tokens.shape
    GK = G * K
    V = state.last_logits.shape[1]
    ids = jnp.arange(V)
    xkv = whisper.QuantKVCache(state.xkv_k, state.xkv_ks,
                               state.xkv_v, state.xkv_vs)
    cross_group = K if whisper.beam_grouped_ok(cfg, K) else 1

    def one_step(state, _):
        live = state.active & ~state.finished
        liver = jnp.repeat(live, K)
        stepv = jnp.repeat(state.step, K)
        if "filter" in ablate:
            lg = state.last_logits
        else:
            ts_flat = (state.ts_prev.reshape(GK),
                       state.ts_prevprev.reshape(GK),
                       state.ts_floor.reshape(GK))
            lg = _filter_logits(state.last_logits,
                                suppress_mask=suppress_mask, length=stepv,
                                ts_state=ts_flat,
                                use_ts=jnp.repeat(state.use_ts, K), sp=sp,
                                ids=ids, max_initial_index=50,
                                blank_token=220)

        if "lsm" in ablate:
            logprobs = lg                       # shapes right, math bogus
            nxt_s = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            rng2 = state.rng.reshape(GK, 2)
        else:
            nxt_s, rng2, logprobs = _choose_tokens(
                lg, jnp.repeat(state.temperature, K),
                state.rng.reshape(GK, 2))

        if "topk" in ablate:
            parent_sel = jnp.broadcast_to(jnp.arange(K)[None], (G, K))
            tok_sel = jnp.argmax(lg, axis=-1).astype(
                jnp.int32).reshape(G, K)
            alive_lp, alive_len = state.alive_lp, state.alive_len + 1
            fin_scores, fin_tokens = state.fin_scores, state.fin_tokens
            fin_lens, done_row = state.fin_lens, state.done_row
        else:
            lpg = logprobs.reshape(G, K, V)
            cand = state.alive_lp[:, :, None] + lpg
            top_lp, top_idx = jax.lax.top_k(cand.reshape(G, K * V), 2 * K)
            parent = top_idx // V
            tok = (top_idx % V).astype(jnp.int32)
            is_eot_c = tok == eot
            new_len = jnp.take_along_axis(state.alive_len, parent,
                                          axis=1) + 1
            eot_scores = jnp.where(
                is_eot_c, _length_score(top_lp, new_len, None), NEG_INF)
            cand_tokens = _gather_beams({"t": state.tokens}, parent)["t"]
            all_scores = jnp.concatenate([state.fin_scores, eot_scores], 1)
            all_tokens = jnp.concatenate([state.fin_tokens, cand_tokens], 1)
            all_lens = jnp.concatenate(
                [state.fin_lens, jnp.where(is_eot_c, new_len - 1, 0)], 1)
            fin_scores, fin_idx = jax.lax.top_k(all_scores, K)
            fin_tokens = jnp.take_along_axis(all_tokens,
                                             fin_idx[:, :, None], axis=1)
            fin_lens = jnp.take_along_axis(all_lens, fin_idx, axis=1)
            alive_cand = jnp.where(is_eot_c, NEG_INF, top_lp)
            alive_lp, aidx = jax.lax.top_k(alive_cand, K)
            parent_sel = jnp.take_along_axis(parent, aidx, axis=1)
            tok_sel = jnp.take_along_axis(tok, aidx, axis=1)
            alive_len = jnp.take_along_axis(new_len, aidx, axis=1)
            done_row = state.done_row

        pos_g = state.prompt_len + state.step
        gathered = _gather_beams({"t": state.tokens}, parent_sel)["t"]
        tokens = jax.vmap(
            lambda rows, t, p: jax.lax.dynamic_update_slice(
                rows, t[:, None], (0, p)))(gathered, tok_sel, pos_g)

        if "filter" in ablate:
            ts_sel = (state.ts_prev.reshape(GK),
                      state.ts_prevprev.reshape(GK),
                      state.ts_floor.reshape(GK))
        else:
            ts_g = _gather_beams(
                {"a": state.ts_prev, "b": state.ts_prevprev,
                 "c": state.ts_floor}, parent_sel)
            ts_old = (ts_g["a"].reshape(GK), ts_g["b"].reshape(GK),
                      ts_g["c"].reshape(GK))
            ts_sel = decoding._update_ts_state(ts_old, tok_sel.reshape(GK),
                                               sp_consts, stepv)

        if "gather" in ablate:
            cache = whisper.KVCache(state.cache_k, state.cache_v)
        elif "onehot" in ablate:
            # Permutation as a one-hot matmul: bit-exact (single nonzero
            # coefficient per output row) and MXU/memory-bound instead of
            # the slow axis-1 gather.
            flat_parent = (parent_sel
                           + jnp.arange(G)[:, None] * K).reshape(GK)
            oh = jax.nn.one_hot(flat_parent, GK,
                                dtype=state.cache_k.dtype)
            perm = lambda b: jnp.einsum("gp,lptd->lgtd", oh, b)
            cache = whisper.KVCache(perm(state.cache_k),
                                    perm(state.cache_v))
        else:
            flat_parent = (parent_sel
                           + jnp.arange(G)[:, None] * K).reshape(GK)
            cache = whisper.KVCache(state.cache_k[:, flat_parent],
                                    state.cache_v[:, flat_parent])
        feed = tok_sel.reshape(GK)
        logits, cache = whisper.decode(cfg, params, feed[:, None],
                                       jnp.repeat(pos_g, K), cache, xkv,
                                       cross_group=cross_group)
        last_logits = jnp.where(liver[:, None],
                                logits[:, -1].astype(jnp.float32),
                                state.last_logits)
        return state._replace(
            cache_k=cache.k, cache_v=cache.v, tokens=tokens,
            alive_lp=alive_lp, alive_len=alive_len,
            fin_scores=fin_scores, fin_tokens=fin_tokens,
            fin_lens=fin_lens,
            ts_prev=ts_sel[0].reshape(G, K),
            ts_prevprev=ts_sel[1].reshape(G, K),
            ts_floor=ts_sel[2].reshape(G, K),
            step=state.step + jnp.where(live, 1, 0),
            last_logits=last_logits, done_row=done_row), None

    state, _ = jax.lax.scan(one_step, state, None, length=inner_steps)
    return state


# "production" is not an ablation: it times the REAL beam_batcher.step
# (since round 4 that is the ancestry-masked grouped step for K·H ≤ 128 —
# model.decode_beam_step — which this file's gather-formulation copy
# predates). Keep both: production is the number that ships; the ablated
# gather formulation decomposes where the old cost went.
VARIANTS = {
    "production": None,
    "full": frozenset(),
    "no_filter": frozenset({"filter"}),
    "no_lsm": frozenset({"lsm"}),
    "no_topk": frozenset({"topk"}),
    "no_gather": frozenset({"gather"}),
    "oh_gather": frozenset({"onehot"}),
    "decode_only": frozenset({"filter", "lsm", "topk", "gather"}),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--beam-size", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=144)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    cfg = get_config(args.model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    G, K = args.groups, args.beam_size
    V = cfg.n_vocab_padded
    rng = np.random.default_rng(0)
    suppress = jnp.zeros((V,), bool)

    def fresh_state():
        s = beam_batcher.init_state(cfg, G, K, max_len=args.max_len)
        return s._replace(
            active=jnp.ones((G,), bool),
            last_logits=jnp.asarray(
                rng.standard_normal((G * K, V)), jnp.float32),
            alive_lp=jnp.zeros((G, K), jnp.float32),
            prompt_len=jnp.full((G,), 4, jnp.int32),
            max_new=jnp.full((G,), 10_000, jnp.int32),
            xkv_k=jnp.asarray(rng.integers(-127, 127, s.xkv_k.shape),
                              jnp.int8),
            xkv_v=jnp.asarray(rng.integers(-127, 127, s.xkv_v.shape),
                              jnp.int8),
            xkv_ks=jnp.full(s.xkv_ks.shape, 0.01, jnp.float32),
            xkv_vs=jnp.full(s.xkv_vs.shape, 0.01, jnp.float32))

    for name in args.variants.split(","):
        abl = VARIANTS[name]
        state = fresh_state()

        if abl is None:           # production: the real serving step
            def dispatch(s):
                return beam_batcher.step(cfg, params, s, suppress,
                                         inner_steps=args.inner)
        else:
            def dispatch(s, abl=abl):
                donated, kept = beam_batcher._pack(s)
                return step_ablated(cfg, donated, kept, suppress,
                                    inner_steps=args.inner, ablate=abl,
                                    params=params)

        t0 = time.time()
        state = dispatch(state)
        np.asarray(state.alive_lp)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.dispatches):
            state = dispatch(state)
        np.asarray(state.alive_lp)
        dt = time.time() - t0
        n = args.dispatches * args.inner
        print(f"{name:12s} {1000 * dt / n:7.2f} ms/step "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
