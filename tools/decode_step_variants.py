"""Bisect the decode step's 7.7 ms/step overhead (B=32: components sum
10.7 ms, production step 18.4 ms — tools/decode_components.py).

Variants of the S=1 scalar-pos decode step, timed with the dispatch-
cancelled repeat trick:

  A  production decode()                        (reference)
  B  cache update skipped, ys still emitted     (isolates the scatter)
  C  cache not returned at all (no ys)          (isolates the 1.3 GB
                                                 stacked-ys write)
  D  logits dot in bf16 (no fp32 tok_emb cast)  (isolates the 133 MB →
                                                 fp32 convert+transpose)
  E  no logits at all                           (bounds the whole head)
  F  cache as scan CARRY with in-place updates  (the candidate fix)

Usage: python tools/decode_step_variants.py [model] [batch] [cache_len]
"""

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
    def run(reps):
        np.asarray(jax.tree_util.tree_leaves(fn(reps, *args))[0]
                   .reshape(-1)[:1])

    run(R_LO); run(R_HI)
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
    H = cfg.n_text_head
    HD, L, T = cfg.n_text_state, cfg.n_text_layer, cfg.n_audio_ctx
    rng = jax.random.PRNGKey(0)
    print(f"model={model} B={B} L={L} cache={cache_len} "
          f"backend={jax.devices()[0].platform}")

    params = whisper.init_params(cfg, rng, dtype=jnp.bfloat16)
    feats = jax.random.normal(rng, (B, T, HD), jnp.bfloat16) * .1
    xkv = whisper.compute_cross_kv_quant(cfg, params, feats)
    cache = whisper.init_kv_cache(cfg, B, dtype=jnp.bfloat16,
                                  max_len=cache_len)
    dec = params["decoder"]
    pos0 = jnp.int32(8)
    mask = jnp.arange(cache_len)[None, :] <= pos0

    def variant_step(x_tok, kc, vc, xkv, dec, *, update, emit_ys,
                     logits_mode, pos):
        """One S=1 decode step re-built from decode()'s exact pieces,
        with the cache path and logits head made swappable."""

        def block(x, scanned):
            lp, k_cache, v_cache, xk, xks, xv, xvs = scanned
            h = whisper.layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
            q = whisper._mm(h, lp["q_w"]) + lp["q_b"]
            k_new = whisper._mm(h, lp["k_w"])
            v_new = whisper._mm(h, lp["v_w"]) + lp["v_b"]
            if update:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_new.astype(k_cache.dtype), (0, pos, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_new.astype(v_cache.dtype), (0, pos, 0))
            attn = whisper._attend_decode_flat(
                q[:, 0], k_cache, v_cache, mask, H)[:, None]
            x = x + whisper._mm(attn, lp["o_w"]) + lp["o_b"]
            h = whisper.layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
            xq = whisper._mm(h, lp["xq_w"]) + lp["xq_b"]
            attn = whisper._attend_decode_flat(
                xq[:, 0], xk, xv, None, H, ks=xks, vs=xvs)[:, None]
            x = x + whisper._mm(attn, lp["xo_w"]) + lp["xo_b"]
            h = whisper.layer_norm(x, lp["ln3_scale"], lp["ln3_bias"])
            x = x + whisper._mlp(h, lp)
            return x, ((k_cache, v_cache) if emit_ys else None)

        xs = (dec["layers"], kc, vc, xkv.k, xkv.k_scale, xkv.v,
              xkv.v_scale)
        x, ys = jax.lax.scan(block, x_tok, xs)
        x = whisper.layer_norm(x, dec["ln_scale"], dec["ln_bias"])
        if logits_mode == "fp32":
            logits = jnp.dot(x.astype(jnp.float32),
                             dec["tok_emb"].T.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        elif logits_mode == "bf16":
            logits = jnp.dot(x, dec["tok_emb"].T,
                             preferred_element_type=jnp.float32)
        else:
            logits = jnp.broadcast_to(
                x.astype(jnp.float32), (B, 1, HD))
        return logits, ys

    def loop(update, emit_ys, logits_mode):
        # params/xkv passed as ARGUMENTS: closing over them bakes 5.8 GB
        # of constants into the lowered program (doubles HBM, stalls
        # compile).
        def run(reps, kc, vc, params, xkv):
            d = params["decoder"]

            def rep(i, carry):
                tok, kc, vc = carry
                x = d["tok_emb"][tok] + d["pos_emb"][
                    pos0 + jnp.arange(1)].astype(jnp.bfloat16)
                lo, ys = variant_step(x, kc, vc, xkv, d,
                                      update=update, emit_ys=emit_ys,
                                      logits_mode=logits_mode, pos=8)
                if emit_ys:
                    kc, vc = ys
                nxt = jnp.argmax(lo[:, -1:], -1).astype(jnp.int32)
                return nxt % 51865, kc, vc

            tok0 = jnp.zeros((B, 1), jnp.int32)
            return jax.lax.fori_loop(0, reps, rep, (tok0, kc, vc))[0]

        return jax.jit(run, static_argnums=0)

    # A: the real production decode() for reference.
    def full(reps, params, cache, xkv):
        def rep(_, carry):
            tok, cache = carry
            lo, cache = whisper.decode(cfg, params, tok, pos0, cache,
                                       xkv)
            return jnp.argmax(lo[:, -1:], -1).astype(jnp.int32), cache

        tok0 = jnp.zeros((B, 1), jnp.int32)
        return jax.lax.fori_loop(0, reps, rep, (tok0, cache))[0]

    t_a = timed_pair(jax.jit(full, static_argnums=0), params, cache, xkv)
    print(f"A production decode():            {t_a:7.2f} ms")
    t_a2 = timed_pair(loop(True, True, "fp32"), cache.k, cache.v,
                      params, xkv)
    print(f"A' rebuilt (sanity, ≈A):          {t_a2:7.2f} ms")
    t_b = timed_pair(loop(False, True, "fp32"), cache.k, cache.v,
                     params, xkv)
    print(f"B  no cache update (ys kept):     {t_b:7.2f} ms "
          f"(update cost {t_a2 - t_b:+.2f})")
    t_c = timed_pair(loop(True, False, "fp32"), cache.k, cache.v,
                     params, xkv)
    print(f"C  cache not emitted (no ys):     {t_c:7.2f} ms "
          f"(ys write cost {t_a2 - t_c:+.2f})")
    t_d = timed_pair(loop(True, True, "bf16"), cache.k, cache.v,
                     params, xkv)
    print(f"D  bf16 logits dot:               {t_d:7.2f} ms "
          f"(fp32 cast cost {t_a2 - t_d:+.2f})")
    t_e = timed_pair(loop(True, True, "none"), cache.k, cache.v,
                     params, xkv)
    print(f"E  no logits head:                {t_e:7.2f} ms "
          f"(whole head cost {t_a2 - t_e:+.2f})")

    # F: cache as CARRY [L,B,T,HD], per-layer in-place update via
    # dynamic_update_slice at (l, 0, pos, 0); layers still scanned but
    # the cache never flows through stacked ys.
    def loop_carry():
        def run(reps, kfull, vfull, params, xkv):
            dec = params["decoder"]

            def rep(i, carry):
                tok, kfull, vfull = carry
                x = dec["tok_emb"][tok] + dec["pos_emb"][
                    pos0 + jnp.arange(1)].astype(jnp.bfloat16)

                def block(state, scanned):
                    x, kfull, vfull, l = state
                    lp, xk, xks, xv, xvs = scanned
                    h = whisper.layer_norm(x, lp["ln1_scale"],
                                           lp["ln1_bias"])
                    q = whisper._mm(h, lp["q_w"]) + lp["q_b"]
                    k_new = whisper._mm(h, lp["k_w"])
                    v_new = whisper._mm(h, lp["v_w"]) + lp["v_b"]
                    kfull = jax.lax.dynamic_update_slice(
                        kfull, k_new.astype(kfull.dtype)[None],
                        (l, 0, 8, 0))
                    vfull = jax.lax.dynamic_update_slice(
                        vfull, v_new.astype(vfull.dtype)[None],
                        (l, 0, 8, 0))
                    k_cache = jax.lax.dynamic_slice(
                        kfull, (l, 0, 0, 0), (1, B, cache_len, HD))[0]
                    v_cache = jax.lax.dynamic_slice(
                        vfull, (l, 0, 0, 0), (1, B, cache_len, HD))[0]
                    attn = whisper._attend_decode_flat(
                        q[:, 0], k_cache, v_cache, mask, H)[:, None]
                    x = x + whisper._mm(attn, lp["o_w"]) + lp["o_b"]
                    h = whisper.layer_norm(x, lp["ln2_scale"],
                                           lp["ln2_bias"])
                    xq = whisper._mm(h, lp["xq_w"]) + lp["xq_b"]
                    attn = whisper._attend_decode_flat(
                        xq[:, 0], xk, xv, None, H, ks=xks,
                        vs=xvs)[:, None]
                    x = x + whisper._mm(attn, lp["xo_w"]) + lp["xo_b"]
                    h = whisper.layer_norm(x, lp["ln3_scale"],
                                           lp["ln3_bias"])
                    x = x + whisper._mlp(h, lp)
                    return (x, kfull, vfull, l + 1), None

                xs = (dec["layers"], xkv.k, xkv.k_scale, xkv.v,
                      xkv.v_scale)
                (x, kfull, vfull, _), _ = jax.lax.scan(
                    block, (x, kfull, vfull, jnp.int32(0)), xs)
                x = whisper.layer_norm(x, dec["ln_scale"],
                                       dec["ln_bias"])
                logits = jnp.dot(x.astype(jnp.float32),
                                 dec["tok_emb"].T.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                return nxt % 51865, kfull, vfull

            tok0 = jnp.zeros((B, 1), jnp.int32)
            return jax.lax.fori_loop(0, reps, rep,
                                     (tok0, kfull, vfull))[0]

        return jax.jit(run, static_argnums=0)

    t_f = timed_pair(loop_carry(), cache.k, cache.v, params, xkv)
    print(f"F  cache as carry (in-place):     {t_f:7.2f} ms "
          f"(vs A' {t_f - t_a2:+.2f})")

    # G: delta-return decode — the cache is READ-ONLY inside the layer
    # scan (xs slices, no ys emission); each layer also attends to the
    # CURRENT token's k/v directly (one extra key concatenated into the
    # softmax), and returns (k_new, v_new) as the ONLY ys ([L,B,1,HD],
    # 2.6 MB). The outer loop writes that delta into its carried cache
    # with one dynamic_update_slice — in-place on the loop carry.
    def attend_ro(q, k_cache, v_cache, k_new, v_new, n_head, msk):
        D = HD // n_head
        sel = jnp.asarray(whisper._bd_selector(n_head, D))
        qbd = q.reshape(B, HD, 1) * sel.astype(q.dtype)[None]
        scores = jnp.einsum("btk,bkh->bth", k_cache, qbd,
                            preferred_element_type=jnp.float32
                            )[..., :n_head] * (D ** -0.5)
        scores = jnp.where(msk[..., None], scores,
                           jnp.finfo(jnp.float32).min)
        # Current token's key: per-head dot q·k_new → [B, 1, H].
        s_new = (jnp.sum(q.reshape(B, n_head, D).astype(jnp.float32)
                         * k_new.reshape(B, n_head, D), -1)
                 * (D ** -0.5))[:, None]
        probs = jax.nn.softmax(jnp.concatenate([scores, s_new], 1), 1)
        out_hk = jnp.einsum("bth,btk->bhk",
                            probs[:, :-1].astype(v_cache.dtype),
                            v_cache, preferred_element_type=jnp.float32)
        o4 = out_hk.reshape(B, n_head, n_head, D)
        eye = jnp.asarray(np.eye(n_head, dtype=np.float32))
        out = jnp.einsum("bhgd,hg->bhd", o4, eye)
        out = out + (probs[:, -1, :, None].astype(jnp.float32)
                     * v_new.reshape(B, n_head, D))
        return out.reshape(B, HD).astype(q.dtype)

    def loop_delta():
        def run(reps, kfull, vfull, params, xkv):
            dec = params["decoder"]
            # Key j strictly BELOW pos comes from the cache; position
            # pos itself is the appended current token.
            msk = jnp.arange(cache_len)[None, :] < pos0

            def rep(i, carry):
                tok, kfull, vfull = carry
                x = dec["tok_emb"][tok] + dec["pos_emb"][
                    pos0 + jnp.arange(1)].astype(jnp.bfloat16)

                def block(x, scanned):
                    lp, k_cache, v_cache, xk, xks, xv, xvs = scanned
                    h = whisper.layer_norm(x, lp["ln1_scale"],
                                           lp["ln1_bias"])
                    q = whisper._mm(h, lp["q_w"]) + lp["q_b"]
                    k_new = whisper._mm(h, lp["k_w"])
                    v_new = whisper._mm(h, lp["v_w"]) + lp["v_b"]
                    attn = attend_ro(q[:, 0], k_cache, v_cache,
                                     k_new[:, 0], v_new[:, 0], H,
                                     msk)[:, None]
                    x = x + whisper._mm(attn, lp["o_w"]) + lp["o_b"]
                    h = whisper.layer_norm(x, lp["ln2_scale"],
                                           lp["ln2_bias"])
                    xq = whisper._mm(h, lp["xq_w"]) + lp["xq_b"]
                    attn = whisper._attend_decode_flat(
                        xq[:, 0], xk, xv, None, H, ks=xks,
                        vs=xvs)[:, None]
                    x = x + whisper._mm(attn, lp["xo_w"]) + lp["xo_b"]
                    h = whisper.layer_norm(x, lp["ln3_scale"],
                                           lp["ln3_bias"])
                    x = x + whisper._mlp(h, lp)
                    return x, (k_new.astype(kfull.dtype),
                               v_new.astype(vfull.dtype))

                xs = (dec["layers"], kfull, vfull, xkv.k, xkv.k_scale,
                      xkv.v, xkv.v_scale)
                x, (dk, dv) = jax.lax.scan(block, x, xs)
                kfull = jax.lax.dynamic_update_slice(
                    kfull, dk, (0, 0, 8, 0))
                vfull = jax.lax.dynamic_update_slice(
                    vfull, dv, (0, 0, 8, 0))
                x = whisper.layer_norm(x, dec["ln_scale"],
                                       dec["ln_bias"])
                logits = jnp.dot(x.astype(jnp.float32),
                                 dec["tok_emb"].T.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                return nxt % 51865, kfull, vfull

            tok0 = jnp.zeros((B, 1), jnp.int32)
            return jax.lax.fori_loop(0, reps, rep,
                                     (tok0, kfull, vfull))[0]

        return jax.jit(run, static_argnums=0)

    t_g = timed_pair(loop_delta(), cache.k, cache.v, params, xkv)
    print(f"G  read-only cache + delta write: {t_g:7.2f} ms "
          f"(vs A' {t_g - t_a2:+.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
