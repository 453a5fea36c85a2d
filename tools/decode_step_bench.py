#!/usr/bin/env python3
"""Decode-step microbenchmark: flat block-diagonal attention vs the
per-head einsum formulation, on real hardware.

The decode step is HBM-bound; its cost is weights + cross-KV + self-cache
reads. Component probes on v5e (B=8, large-v3 shapes, proper tunnel sync):

  per-head einsum  [B,H,T,D]:  int8 cross-attn  80 GB/s eff,
                               bf16 self-attn   99 GB/s
  flat block-diag  [B,T,H*D]:  bf16             220 GB/s
  flat + int8 MXU dots:        int8 cross-attn  323 GB/s eff

(Pallas kernels v1/v2/v3 measured 103-241 GB/s — the auto/manual DMA
pipelines never beat XLA's batched-matmul path on this part, so the
production path is the flat XLA formulation; ops/decode_attention*.py
keep the kernel experiments.)

Usage: python tools/decode_step_bench.py [model] [batch] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cache_len = 256

    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    feats = jax.random.normal(jax.random.PRNGKey(1),
                              (B, cfg.n_audio_ctx, cfg.n_audio_state),
                              jnp.bfloat16) * 0.1
    xkv = whisper.compute_cross_kv_quant(cfg, params, feats)
    cache = whisper.init_kv_cache(cfg, B, dtype=jnp.bfloat16,
                                  max_len=cache_len)

    @jax.jit
    def run(tok, cache):
        def step(i, carry):
            tok, cache = carry
            logits, cache = whisper.decode(cfg, params, tok,
                                           jnp.int32(4) + i, cache, xkv)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return nxt, cache
        return jax.lax.fori_loop(0, steps, step, (tok, cache))

    tok = jnp.full((B, 1), 50258, jnp.int32)
    out, cache2 = run(tok, cache)
    np.asarray(out[:1, :1])          # tunnel-safe sync (tiny transfer)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out, cache2 = run(tok, cache)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / (reps * steps)

    dec_bytes = sum(a.size * a.dtype.itemsize
                    for a in jax.tree.leaves(params["decoder"]))
    kv_bytes = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(xkv))
    cache_bytes = cache.k.size * cache.k.dtype.itemsize * 2
    total = dec_bytes + kv_bytes + cache_bytes
    print(f"{model} B={B}: decode step {dt*1e3:.3f} ms "
          f"({B/dt:.0f} tok/s aggregate)")
    print(f"  traffic/step: weights {dec_bytes/1e6:.0f} MB, "
          f"xkv {kv_bytes/1e6:.0f} MB, cache {cache_bytes/1e6:.0f} MB "
          f"→ effective {total/dt/1e9:.0f} GB/s "
          f"(ideal @820 GB/s = {total/820e9*1e3:.2f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
