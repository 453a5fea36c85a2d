"""Speculative-decoding cost model, measured on hardware.

Speculation is token-exact, so its value is pure speed and fully
determined by two measurables + the draft's accept rate:

    speedup(m) = m * t_greedy_step / t_iter

where m = mean tokens emitted per verify iteration (1 + accepted),
t_greedy_step = plain greedy per-token cost, t_iter = one speculative
iteration (K draft steps + 1 K-wide verify). A random-init draft accepts
~nothing (m=1), which measures t_iter exactly; trained turbo-style
drafts land at m ≈ 3-4.5 for K=5 (literature + distillation lineage).

Usage: python tools/spec_bench.py [target] [draft] [batch] [k]
Defaults: large-v3 large-v3-turbo 1 5
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.models.whisper.speculative import speculative_greedy_loop
from openhush_tpu.text.tokenizer import WhisperTokenizer

MAX_NEW = 128


def main() -> int:
    target = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    draft = sys.argv[2] if len(sys.argv) > 2 else "large-v3-turbo"
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    cfg, dcfg = get_config(target), get_config(draft)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    dparams = whisper.init_params(dcfg, jax.random.PRNGKey(1),
                                  dtype=jnp.bfloat16)
    tok = WhisperTokenizer(cfg.n_langs)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(0.1 * rng.standard_normal(
        (B, cfg.n_audio_ctx, cfg.n_audio_state)), jnp.bfloat16)
    xkv = whisper.compute_cross_kv_quant(cfg, params, feats)
    dxkv = whisper.compute_cross_kv(dcfg, dparams, feats)

    opts = decoding.DecodingOptions(without_timestamps=True)
    prompt = tok.sot_sequence("en", "transcribe", timestamps=False)
    parr = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
    suppress = jnp.asarray(decoding.build_suppress_mask(tok, cfg, opts))
    blank = tok.encode(" ")[0]
    common = dict(prompt_len=len(prompt), max_new=MAX_NEW,
                  use_timestamps=False, suppress_blank=True,
                  max_initial_index=50, blank_token=int(blank))
    cache_len = ((len(prompt) + MAX_NEW + K + 63) // 64) * 64

    def run_greedy():
        cache = whisper.init_kv_cache(cfg, B, dtype=jnp.bfloat16,
                                      max_len=cache_len)
        out = decoding.greedy_loop(cfg, params, xkv, cache, parr,
                                   suppress, jnp.float32(0.0),
                                   jax.random.PRNGKey(0), **common)
        return np.asarray(out[2])        # lengths — forces completion

    def run_spec():
        cache = whisper.init_kv_cache(cfg, B, dtype=jnp.bfloat16,
                                      max_len=cache_len)
        dcache = whisper.init_kv_cache(dcfg, B, dtype=jnp.bfloat16,
                                       max_len=cache_len)
        out = speculative_greedy_loop(cfg, params, dcfg, dparams, xkv,
                                      dxkv, cache, dcache, parr,
                                      suppress, k_spec=K, **common)
        return np.asarray(out[2])

    def timeit(fn):
        fn(); fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), int(n.max())

    t_g, n_g = timeit(run_greedy)
    t_s, n_s = timeit(run_spec)
    # Random draft ⇒ ~1 token/iteration ⇒ t_iter ≈ t_s / tokens.
    t_step = t_g / max(n_g, 1)
    t_iter = t_s / max(n_s, 1)
    print(f"target={target} draft={draft} B={B} K={K} "
          f"tokens: greedy {n_g}, spec {n_s}")
    print(f"greedy step: {t_step * 1000:.2f} ms/token")
    print(f"spec iteration (K={K} draft steps + K-wide verify): "
          f"{t_iter * 1000:.2f} ms")
    print("projected speedup vs accept rate "
          "(m = tokens/iter = 1 + (K-1)*alpha):")
    for alpha in (0.0, 0.4, 0.6, 0.8, 0.95):
        m = 1 + (K - 1) * alpha
        print(f"  alpha={alpha:.2f}: m={m:.2f} -> "
              f"{m * t_step / t_iter:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
