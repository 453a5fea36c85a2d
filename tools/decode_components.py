"""Decode-step component profiler: where do the 18.8 ms/step (B=32) go?

Times each component of the decode hot loop in ISOLATION — cross-attention
(int8 flat), self-attention (bf16 flat), the dense linears (weight reads),
and the vocab logits dot — plus formulation variants, so optimization
effort targets the real cost. Every component runs R times inside ONE
dispatch via a carry-dependent fori_loop and is timed by the DIFFERENCE
between two repeat counts (same trick as bench_phases --roofline), so the
numbers are pure device time with dispatch overhead cancelled exactly.

Usage: python tools/decode_components.py [model] [batch] [cache_len]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("OPENHUSH_BENCH_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config

R_LO, R_HI = 4, 12


def timed_pair(fn, *args) -> float:
    """Device ms per single repetition, dispatch-cancelled."""

    def run(reps):
        np.asarray(jax.tree_util.tree_leaves(fn(reps, *args))[0]
                   .reshape(-1)[:1])

    run(R_LO); run(R_HI)                    # compile both
    ts = {}
    for reps in (R_LO, R_HI):
        run(reps)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(reps)
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    return (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO) * 1000


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cache_len = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    cfg = get_config(model)
    H, D = cfg.n_text_head, cfg.n_text_state // cfg.n_text_head
    HD, L, T = cfg.n_text_state, cfg.n_text_layer, cfg.n_audio_ctx
    V = cfg.n_vocab
    rng = jax.random.PRNGKey(0)
    print(f"model={model} B={B} L={L} H={H} D={D} Tcross={T} "
          f"cache={cache_len} backend={jax.devices()[0].platform}")

    # ---- full production step FIRST (params + cross-KV ~ 7.6 GB at
    # large-v3/B=32; it must not coexist with the synthetic tensors) ----
    params = whisper.init_params(cfg, rng, dtype=jnp.bfloat16)
    feats = jax.random.normal(rng, (B, T, HD), jnp.bfloat16) * .1
    xkv = whisper.compute_cross_kv_quant(cfg, params, feats)
    cache = whisper.init_kv_cache(cfg, B, dtype=jnp.bfloat16,
                                  max_len=cache_len)

    def full(reps, params, cache, xkv):
        def rep(_, carry):
            tok, cache = carry
            lo, cache = whisper.decode(cfg, params, tok, jnp.int32(8),
                                       cache, xkv)
            return jnp.argmax(lo[:, -1:], -1).astype(jnp.int32), cache

        tok0 = jnp.zeros((B, 1), jnp.int32)
        return jax.lax.fori_loop(0, reps, rep, (tok0, cache))[0]

    t_full = timed_pair(jax.jit(full, static_argnums=0),
                        params, cache, xkv)
    del params, feats, xkv, cache
    import gc
    gc.collect()

    # ---- synthetic tensors with production shapes/dtypes ----
    k8 = jax.random.randint(rng, (L, B, T, HD), -127, 127, jnp.int8)
    v8 = jax.random.randint(rng, (L, B, T, HD), -127, 127, jnp.int8)
    ks = jnp.abs(jax.random.normal(rng, (L, B, T, H), jnp.float32)) * .01
    vs = jnp.abs(jax.random.normal(rng, (L, B, T, H), jnp.float32)) * .01
    kc = jax.random.normal(rng, (L, B, cache_len, HD), jnp.bfloat16) * .1
    vc = jax.random.normal(rng, (L, B, cache_len, HD), jnp.bfloat16) * .1
    mask = jnp.ones((1, cache_len), bool)
    q0 = jax.random.normal(rng, (B, HD), jnp.bfloat16)

    def layer_scan(attend):
        """Run `attend(q, layer_kv...)` over all L layers, q chained so
        nothing can be hoisted; repeated `reps` times on a second carry."""

        def one(reps, *kv):
            def rep(_, q):
                def body(q, per_layer):
                    o = attend(q, *per_layer)
                    return (q + o.astype(q.dtype) * 1e-3), None

                q, _ = jax.lax.scan(body, q, kv)
                return q

            return jax.lax.fori_loop(0, reps, rep, q0)

        return jax.jit(one, static_argnums=0)

    # Cross-attention, production formulation (int8 MXU dots, LANE=128).
    cross = layer_scan(lambda q, k, v, a, b: whisper._attend_decode_flat(
        q, k, v, None, H, ks=a, vs=b))
    t_cross = timed_pair(cross, k8, v8, ks, vs)

    # Variant: slim selector (score lanes = n_head, not 128) — does the
    # [..., :n_head] slice of a LANE-wide int32 einsum output cost real
    # bandwidth, or does XLA fuse it?
    def attend_slim(q, k_flat, v_flat, kss, vss):
        sel = jnp.asarray(whisper._bd_selector(H, D)[:, :H])
        q32 = q.astype(jnp.float32).reshape(B, H, D)
        qscale = jnp.maximum(jnp.max(jnp.abs(q32), -1), 1e-10) / 127.
        q8 = jnp.clip(jnp.round(q32 / qscale[..., None]), -127, 127)
        qbd = (q8.reshape(B, HD, 1) * sel[None]).astype(jnp.int8)
        si = jnp.einsum("btk,bkh->bth", k_flat, qbd,
                        preferred_element_type=jnp.int32)
        scores = si.astype(jnp.float32) * kss * qscale[:, None] * D ** -.5
        probs = jax.nn.softmax(scores, axis=1)
        pv = probs * vss
        psc = jnp.maximum(jnp.max(pv, 1), 1e-20) / 127.
        p8 = jnp.clip(jnp.round(pv / psc[:, None]), -127, 127
                      ).astype(jnp.int8)
        oi = jnp.einsum("bth,btk->bhk", p8, v_flat,
                        preferred_element_type=jnp.int32)
        ohk = oi.astype(jnp.float32) * psc[..., None]
        o4 = ohk.reshape(B, H, H, D)
        eye = jnp.asarray(np.eye(H, dtype=np.float32))
        return jnp.einsum("bhgd,hg->bhd", o4, eye).reshape(B, HD)

    t_cross_slim = timed_pair(layer_scan(attend_slim), k8, v8, ks, vs)

    # Variant: K-dot only (scores + softmax, no V side) — splits the
    # cross cost between the two MXU dots.
    def attend_kdot(q, k_flat, v_flat, kss, vss):
        sel = jnp.asarray(whisper._bd_selector(H, D))
        q32 = q.astype(jnp.float32).reshape(B, H, D)
        qscale = jnp.maximum(jnp.max(jnp.abs(q32), -1), 1e-10) / 127.
        q8 = jnp.clip(jnp.round(q32 / qscale[..., None]), -127, 127)
        qbd = (q8.reshape(B, HD, 1) * sel[None]).astype(jnp.int8)
        si = jnp.einsum("btk,bkh->bth", k_flat, qbd,
                        preferred_element_type=jnp.int32)[..., :H]
        scores = si.astype(jnp.float32) * kss * qscale[:, None] * D ** -.5
        probs = jax.nn.softmax(scores, axis=1)
        return jnp.broadcast_to(probs.sum(1)[:, :1], (B, HD))

    t_cross_kdot = timed_pair(layer_scan(attend_kdot), k8, v8, ks, vs)

    # Self-attention (bf16 cache, production formulation).
    self_a = layer_scan(lambda q, k, v: whisper._attend_decode_flat(
        q, k, v, mask, H))
    t_self = timed_pair(self_a, kc, vc)

    # Dense linears: every per-layer weight matmul at S=1 (q/k/v/o + two
    # MLP dots) — the pure weight-read component.
    wq = jax.random.normal(rng, (L, HD, HD), jnp.bfloat16) * .02
    wm1 = jax.random.normal(rng, (L, HD, 4 * HD), jnp.bfloat16) * .02
    wm2 = jax.random.normal(rng, (L, 4 * HD, HD), jnp.bfloat16) * .02

    def linears(q, a, b, c, d, e, f):
        x = q
        for w in (a, b, c, d):
            x = x + (x @ w) * 1e-3
        h = x @ e
        return x + (h @ f) * 1e-3

    lin = layer_scan(linears)
    t_lin = timed_pair(lin, wq, wq, wq, wq, wm1, wm2)

    # Vocab logits: [B, HD] @ [HD, V] once per step.
    wv = jax.random.normal(rng, (HD, V), jnp.bfloat16) * .02

    def logits_fn(reps, w):
        def rep(_, q):
            return q + (q @ w)[:, :HD] * 1e-3

        return jax.lax.fori_loop(0, reps, rep, q0)

    t_logits = timed_pair(jax.jit(logits_fn, static_argnums=0), wv)

    xb = 2 * L * B * T * (HD + 4 * H)
    sb = 2 * L * B * cache_len * HD * 2
    lb = int(sum(w.nbytes for w in (wq, wq, wq, wq, wm1, wm2)))
    print(f"cross-attn (LANE=128): {t_cross:7.2f} ms "
          f"({xb / t_cross / 1e6:.0f} GB/s eff)")
    print(f"cross-attn slim lanes: {t_cross_slim:7.2f} ms "
          f"({xb / t_cross_slim / 1e6:.0f} GB/s eff)")
    print(f"cross-attn K-dot only: {t_cross_kdot:7.2f} ms")
    print(f"self-attn  (bf16):     {t_self:7.2f} ms "
          f"({sb / t_self / 1e6:.0f} GB/s eff)")
    print(f"linears (weight read): {t_lin:7.2f} ms "
          f"({lb / t_lin / 1e6:.0f} GB/s eff)")
    print(f"vocab logits:          {t_logits:7.2f} ms "
          f"({wv.nbytes / t_logits / 1e6:.0f} GB/s eff)")
    parts = t_cross + t_self + t_lin + t_logits
    print(f"components sum:        {parts:7.2f} ms")
    print(f"full production step:  {t_full:7.2f} ms "
          f"(gap vs sum: {t_full - parts:+.2f} ms)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
