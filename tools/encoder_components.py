"""Encoder component profiler: where do the 26.6 ms/layer (B=32) go?

Times the encoder layer's pieces in isolation — the dense projections
(QKVO + MLP, the MXU floor), the flash attention, GELU, and layernorms —
with the dispatch-cancelled repeat trick, then compares their sum to the
full encode. v5e ideal (197 TFLOP/s bf16) for large-v3 B=32 is
~11.4 ms/layer of pure matmul.

Usage: python tools/encoder_components.py [model] [batch]
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

R_LO, R_HI = 2, 6


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
    cfg = get_config(model)
    d, T, L = cfg.n_audio_state, cfg.n_audio_ctx, cfg.n_audio_layer
    H = cfg.n_audio_head
    dh = d // H
    rng = jax.random.PRNGKey(0)
    print(f"model={model} B={B} L={L} d={d} T={T} H={H} "
          f"backend={jax.devices()[0].platform}")

    x0 = jax.random.normal(rng, (B, T, d), jnp.bfloat16) * 0.1
    w = jax.random.normal(rng, (L, d, d), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(rng, (L, d, 4 * d), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(rng, (L, 4 * d, d), jnp.bfloat16) * 0.02

    def chain(body, *ws):
        """body(x, per-layer weights) over L layers, repeated `reps`
        times with a carry dependency."""

        def run(reps, x0, *ws):
            def rep(_, x):
                def layer(x, per):
                    return body(x, *per), None

                x, _ = jax.lax.scan(layer, x, ws)
                return 0.999 * x

            return jax.lax.fori_loop(0, reps, rep, x0)

        return jax.jit(run, static_argnums=0)

    # 1. Dense projections only: 4 [d,d] + [d,4d] + [4d,d] matmuls.
    def proj(x, a, b, c, e, f, g):
        y = whisper._mm(x, a) + whisper._mm(x, b) + whisper._mm(x, c)
        y = whisper._mm(y, e)
        return x + whisper._mm(whisper._mm(y, f), g) * 0.1

    t_proj = timed_pair(chain(proj, w, w, w, w, w1, w2), x0,
                        w, w, w, w, w1, w2)

    # 2. Flash attention alone (production kernel + block sizes).
    def att(x, a):
        q = whisper._mm(x, a).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
        o = whisper._attend_full_local(q, q, q)
        return x + o.transpose(0, 2, 1, 3).reshape(B, T, d) * 0.1

    t_att_all = timed_pair(chain(att, w), x0, w)
    # subtract the single [d,d] projection it needed
    def proj1(x, a):
        return x + whisper._mm(x, a) * 0.1

    t_p1 = timed_pair(chain(proj1, w), x0, w)
    t_att = t_att_all - t_p1

    # 3. GELU alone (exact erf, production default) and tanh variant.
    big = jax.random.normal(rng, (B, T, 4 * d), jnp.bfloat16)

    def gelu_chain(kind):
        def run(reps, y):
            def rep(_, y):
                if kind == "erf":
                    return 0.999 * jax.nn.gelu(y, approximate=False)
                return 0.999 * jax.nn.gelu(y, approximate=True)

            return jax.lax.fori_loop(0, reps * L, rep, y)

        return jax.jit(run, static_argnums=0)

    t_gelu = timed_pair(gelu_chain("erf"), big)
    t_gelu_t = timed_pair(gelu_chain("tanh"), big)

    # 4. LayerNorm x2 per layer.
    g1 = jnp.ones((d,), jnp.bfloat16)

    def ln2(x, _):
        x = whisper.layer_norm(x, g1, g1)
        return 0.999 * whisper.layer_norm(x, g1, g1)

    t_ln = timed_pair(chain(ln2, w), x0, w)

    # 5. Full production encode (mel excluded; feats in directly).
    params = whisper.init_params(cfg, rng, dtype=jnp.bfloat16)
    mel = jax.random.normal(rng, (B, cfg.n_mels, 2 * T), jnp.bfloat16)

    def full(reps, params, mel):
        def rep(_, m):
            f = whisper.encode(cfg, params, m)
            return m + 0 * f[..., :1].mean() * m

        return jax.lax.fori_loop(0, reps, rep, mel)

    t_full = timed_pair(jax.jit(full, static_argnums=0), params, mel)

    flops = (4 * B * T * d * d + 2 * B * T * d * 4 * d) * 2 * L
    print(f"projections (QKVO+MLP): {t_proj:8.1f} ms "
          f"({flops / t_proj / 1e9:.0f} GFLOP/s -> "
          f"{flops / t_proj / 1e9 / 197000 * 100:.0f}% of v5e peak)")
    print(f"flash attention:        {t_att:8.1f} ms "
          f"(incl. in chain {t_att_all:.1f} - proj {t_p1:.1f})")
    print(f"GELU exact erf:         {t_gelu:8.1f} ms")
    print(f"GELU tanh:              {t_gelu_t:8.1f} ms "
          f"(delta {t_gelu - t_gelu_t:+.1f})")
    print(f"layernorm x2:           {t_ln:8.1f} ms")
    parts = t_proj + t_att + t_gelu + t_ln
    print(f"components sum:         {parts:8.1f} ms")
    print(f"full encode:            {t_full:8.1f} ms "
          f"(gap vs sum: {t_full - parts:+.1f} ms; conv stem + "
          f"pos-emb + ln_post in the gap)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
