"""Headline benchmark: large-v3 transcription throughput per TPU chip.

Measures the full compute path on real hardware — raw audio → fused log-mel
frontend → encoder → cross-KV → 128 KV-cached greedy decode steps — for a
batch of 30 s windows (the continuous-batching serving shape). 128 decode
steps/window is deliberately conservative: real speech yields ~75-90 tokens
per 30 s window, so reported throughput UNDERSTATES end-to-end performance.

Baseline (BASELINE.md): reference large-v3 runs 12.5x real-time on an RTX
3090 (RTF 0.08, wiki/User-Guide.md:681). vs_baseline = ours_x / 12.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compilation cache: first large-v3 compile through the dev
# tunnel runs minutes; cached reruns start in seconds.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp")))
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.ops import frontend_pallas
from openhush_tpu.ops import mel as mel_ops

MODEL = os.environ.get("OPENHUSH_BENCH_MODEL", "large-v3")
BATCH = int(os.environ.get("OPENHUSH_BENCH_BATCH", "16"))
DECODE_STEPS = int(os.environ.get("OPENHUSH_BENCH_DECODE_STEPS", "128"))
CACHE_LEN = 256   # decode cache right-sized to prompt+steps (tile-rounded)
BASELINE_X_REALTIME = 12.5   # reference large-v3 on RTX 3090
WINDOW_SECS = 30.0


def make_bench_step(cfg):
    @jax.jit
    def bench_step(params, audio, prompt):
        """audio [B, 480000] → logits after DECODE_STEPS greedy steps."""
        mel = jax.vmap(
            lambda a: frontend_pallas.log_mel(a, n_mels=cfg.n_mels)
        )(audio).astype(jnp.bfloat16)
        feats = whisper.encode(cfg, params, mel)
        cross_kv = whisper.compute_cross_kv_quant(cfg, params, feats)
        if os.environ.get("OPENHUSH_BENCH_INT8_CACHE") == "1":
            cache = whisper.init_quant_kv_cache(cfg, audio.shape[0],
                                                max_len=CACHE_LEN)
        else:
            cache = whisper.init_kv_cache(cfg, audio.shape[0],
                                          dtype=feats.dtype,
                                          max_len=CACHE_LEN)
        logits, cache = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                       cache, cross_kv)
        p = prompt.shape[1]

        def step(i, carry):
            last, cache = carry
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            logits, cache = whisper.decode(cfg, params, nxt[:, None],
                                           p + i, cache, cross_kv)
            return logits[:, -1], cache

        last, cache = jax.lax.fori_loop(0, DECODE_STEPS, step,
                                        (logits[:, -1], cache))
        return last

    return bench_step


def main() -> None:
    cfg = get_config(MODEL)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    if os.environ.get("OPENHUSH_BENCH_INT8_W") == "1":
        # Same knob as the engine's OPENHUSH_INT8_WEIGHTS production path.
        params = whisper.quantize_decoder_weights(params)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        0.1 * rng.standard_normal((BATCH, mel_ops.N_SAMPLES)), jnp.float32)
    prompt = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int32),
                      (BATCH, 1))

    bench_step = make_bench_step(cfg)

    def run_sync():
        # Force completion with a host transfer: on this env's axon backend
        # block_until_ready returns before execution finishes, so a (tiny)
        # device→host read of the result is the only reliable fence.
        return np.asarray(bench_step(params, audio, prompt)[0, :1])

    run_sync()  # warm up / compile
    run_sync()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    wall = min(times)

    audio_secs = BATCH * WINDOW_SECS
    x_realtime = audio_secs / wall
    print(json.dumps({
        "metric": f"{MODEL}_throughput_b{BATCH}_d{DECODE_STEPS}",
        "value": round(x_realtime, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_realtime / BASELINE_X_REALTIME, 3),
    }))


if __name__ == "__main__":
    main()
