"""Hard distillation of a speculative draft against the serving teacher.

Closes the last interpolated number in the bench (VERDICT r4 #5): the
spec serving speedup previously rested on a cost model at ASSUMED accept
rates, because a random-init draft accepts ~nothing. This module trains
a turbo-shaped draft decoder on the teacher's OWN greedy trajectories —
hard distillation, i.e. cross-entropy toward the teacher's emitted
argmax — which is a direct optimization of the speculative accept rate
P[draft argmax == teacher argmax along teacher rollouts]. It needs no
network and no real data: the teacher is whatever params are loaded
(random-init in the bench, real checkpoints under the gate), and the
input distribution is whatever the caller's mel_fn produces.

Faithfulness to the serving pipeline (runtime/server.py spec path):
- rollouts run the big model with the SAME int8 cross-KV
  (compute_cross_kv_quant) the server installs, so the distill targets
  are the argmaxes the verifier will actually produce;
- the caller passes the serving suppress mask and prompt, so the
  filtered-argmax comparison the accept scan performs
  (speculative._filter_chain) is the same function being distilled;
- the draft trains against the teacher's bf16 encoder features, the
  exact tensors EngineServer feeds the draft's cross-KV projections.

Only the draft's DECODER subtree is trained (fp32 master + Adam); the
draft's unused encoder is never materialized in fp32 — at serve time the
draft shares the big model's encoder (speculative.py docstring), so its
own encoder weights are dead HBM anyway.

No reference counterpart: whisper.cpp decodes strictly sequentially
(reference src/engine/whisper.rs:204-305); speculation and this
distillation path are beyond-parity features.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig

NEG_INF = -1e9


def _round64(n: int) -> int:
    return ((n + 63) // 64) * 64


@functools.partial(jax.jit,
                   static_argnames=("cfg", "prompt_len", "gen_tokens"))
def teacher_rollout(cfg: WhisperConfig, params, mel, prompt, suppress, *,
                    prompt_len: int, gen_tokens: int):
    """Encode + greedy rollout in one program: mel [B, n_mels, F] →
    (features bf16 [B, A, D], tokens int32 [B, prompt_len + gen_tokens]).

    The big model decodes over its int8 cross-KV exactly as the serving
    step does; argmaxes are taken over suppress-masked fp32 logits (the
    serving filter chain minus the step-0 blank rule, which touches one
    position in ~128 and is applied identically to draft and verifier at
    serve time, so a mismatch there cannot be created by training)."""
    B = prompt.shape[0]
    feats = whisper.encode(cfg, params, mel)
    xkv = whisper.compute_cross_kv_quant(cfg, params, feats)
    cache = whisper.init_kv_cache(cfg, B, dtype=feats.dtype,
                                  max_len=_round64(prompt_len + gen_tokens))
    logits, cache = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                   cache, xkv)

    def filt_argmax(lg):
        lg = jnp.where(suppress[None, :], NEG_INF, lg.astype(jnp.float32))
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    t0 = filt_argmax(logits[:, -1])

    def step(carry, i):
        tip, cache = carry
        lg, cache = whisper.decode(cfg, params, tip[:, None],
                                   prompt_len + i - 1, cache, xkv)
        nxt = filt_argmax(lg[:, -1])
        return (nxt, cache), nxt

    (_, _), rest = jax.lax.scan(step, (t0, cache),
                                jnp.arange(1, gen_tokens))
    tokens = jnp.concatenate([prompt, t0[:, None], rest.T], axis=1)
    return feats, tokens


def _ce_and_agree(dcfg, dec_params, feats, tokens, suppress, prompt_len):
    """Teacher-forced draft pass over a rollout. Returns (masked CE,
    per-position filtered-argmax agreement on generated positions)."""
    B, T = tokens.shape
    S = T - 1
    dparams = {"decoder": dec_params}
    xkv = whisper.compute_cross_kv(dcfg, dparams, feats)
    cache = whisper.init_kv_cache(
        dcfg, B, dtype=dec_params["pos_emb"].dtype, max_len=_round64(S))
    logits, _ = whisper.decode(dcfg, dparams, tokens[:, :-1],
                               jnp.int32(0), cache, xkv)
    logits = logits.astype(jnp.float32)
    tgt = tokens[:, 1:]
    # Generated positions only: input position prompt_len-1 predicts the
    # first content token. (Vocab-padded tail ids never appear in tgt —
    # argmaxes above are suppress-masked and the pad ids are suppressed.)
    mask = (jnp.arange(S)[None, :] >= prompt_len - 1).astype(jnp.float32)
    denom = mask.sum() * B
    lp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    ce = (nll * mask).sum() / denom
    pred = jnp.argmax(
        jnp.where(suppress[None, None, :], NEG_INF, logits), axis=-1)
    agree = ((pred == tgt) * mask).sum() / denom
    return ce, agree


@functools.partial(jax.jit, static_argnames=("dcfg", "prompt_len"),
                   donate_argnames=("dec_params", "opt_state"))
def _distill_step(dcfg: WhisperConfig, opt_hps, dec_params, opt_state,
                  feats, tokens, suppress, *, prompt_len: int):
    lr, wd = opt_hps
    opt = optax.adamw(lr, weight_decay=wd)

    def loss_fn(dp):
        ce, agree = _ce_and_agree(dcfg, dp, feats, tokens, suppress,
                                  prompt_len)
        return ce, agree

    (ce, agree), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        dec_params)
    updates, opt_state = opt.update(grads, opt_state, dec_params)
    dec_params = optax.apply_updates(dec_params, updates)
    return dec_params, opt_state, ce, agree


@functools.partial(jax.jit, static_argnames=("dcfg", "prompt_len"))
def _eval_step(dcfg: WhisperConfig, dec_params, feats, tokens, suppress,
               *, prompt_len: int):
    return _ce_and_agree(dcfg, dec_params, feats, tokens, suppress,
                         prompt_len)


def distill_draft(cfg: WhisperConfig, params, dcfg: WhisperConfig,
                  mel_fn: Callable[[np.random.Generator], np.ndarray],
                  prompt: np.ndarray, suppress: np.ndarray, *,
                  n_batches: int = 16, epochs: int = 6,
                  gen_tokens: int = 48, lr: float = 3e-4,
                  weight_decay: float = 0.01, seed: int = 7,
                  time_budget_s: Optional[float] = None,
                  serve_dtype=jnp.bfloat16,
                  log: Optional[Callable[[str], None]] = None):
    """Distill a draft for (cfg, params) and return
    (draft_params, stats). draft_params is a full init_params-shaped
    pytree in serve_dtype whose decoder subtree is the distilled one —
    drop-in for EngineServer(draft=(dcfg, draft_params)).

    mel_fn(rng) -> [B, n_mels, F] float mel batch (the caller owns the
    input distribution; the bench feeds the same random-audio mels the
    serving sections decode). prompt [B, P] int32 and suppress [V] bool
    must be the serving prompt and suppress mask.

    One rollout batch is held out; stats['heldout_agree'] is the
    per-position filtered-argmax agreement there — the direct proxy for
    the speculative accept rate, which the caller then measures
    end-to-end through the real server."""
    rng = np.random.default_rng(seed)
    prompt = jnp.asarray(prompt, jnp.int32)
    sup = jnp.asarray(suppress, bool)
    prompt_len = int(prompt.shape[1])
    deadline = (time.monotonic() + time_budget_s
                if time_budget_s else None)

    def say(msg):
        if log:
            log(msg)

    # Rollout corpus (teacher is frozen: collect once, train epochs over
    # it). Device-resident: feats are bf16 [B, A, D] — at B=16 that is
    # ~60 MB/batch, cheap next to the teacher weights.
    corpus = []
    for b in range(n_batches + 1):          # +1 held-out
        mel = jnp.asarray(mel_fn(rng))
        feats, tokens = teacher_rollout(cfg, params, mel, prompt, sup,
                                        prompt_len=prompt_len,
                                        gen_tokens=gen_tokens)
        corpus.append((feats, tokens))
        if deadline and time.monotonic() > deadline and b >= 1:
            say(f"distill: rollout budget hit at {b + 1} batches")
            break
    held = corpus.pop()
    if not corpus:                           # budget left only the held-out
        corpus = [held]

    # fp32 master copy of the DECODER subtree only.
    draft_full = whisper.init_params(dcfg, jax.random.PRNGKey(seed),
                                     dtype=serve_dtype)
    dec = jax.tree.map(lambda a: a.astype(jnp.float32),
                       draft_full["decoder"])
    opt_hps = (float(lr), float(weight_decay))
    opt_state = optax.adamw(*opt_hps).init(dec)

    ce0, agree0 = _eval_step(dcfg, dec, held[0], held[1], sup,
                             prompt_len=prompt_len)
    stats = {"init_heldout_agree": round(float(agree0), 4),
             "init_heldout_ce": round(float(ce0), 3),
             "rollout_batches": len(corpus),
             "gen_tokens": gen_tokens}
    say(f"distill: {len(corpus)} rollout batches x "
        f"{int(corpus[0][1].shape[0])} rows x {gen_tokens} tokens; "
        f"init held-out agree {float(agree0):.3f} ce {float(ce0):.2f}")

    steps = 0
    ce = agree = float("nan")
    for ep in range(epochs):
        order = rng.permutation(len(corpus))
        for bi in order:
            feats, tokens = corpus[bi]
            dec, opt_state, ce_d, ag_d = _distill_step(
                dcfg, opt_hps, dec, opt_state, feats, tokens, sup,
                prompt_len=prompt_len)
            steps += 1
        ce, agree = float(ce_d), float(ag_d)
        if deadline and time.monotonic() > deadline:
            say(f"distill: train budget hit after epoch {ep + 1}")
            break
    hce, hagree = _eval_step(dcfg, dec, held[0], held[1], sup,
                             prompt_len=prompt_len)
    stats.update({"steps": steps,
                  "train_ce": round(ce, 3),
                  "train_agree": round(agree, 4),
                  "heldout_ce": round(float(hce), 3),
                  "heldout_agree": round(float(hagree), 4)})
    say(f"distill: {steps} steps; train agree {agree:.3f}; "
        f"held-out agree {float(hagree):.3f} ce {float(hce):.2f}")

    draft_full["decoder"] = jax.tree.map(
        lambda a: a.astype(serve_dtype), dec)
    return draft_full, stats
