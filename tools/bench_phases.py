"""Phase-split bench: where does a serving batch spend its time?

Splits bench.py's pipeline into (a) frontend+encoder+cross-KV and
(b) the 128-step decode loop, each fenced separately, so optimization
effort goes where the time is. Usage:
    python tools/bench_phases.py [model] [batch] [decode_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.ops import frontend_pallas, mel as mel_ops

CACHE_LEN = 256


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        0.1 * rng.standard_normal((B, mel_ops.N_SAMPLES)), jnp.float32)
    prompt = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int32),
                      (B, 1))

    @jax.jit
    def encode_phase(params, audio):
        mel = jax.vmap(lambda a: frontend_pallas.log_mel(
            a, n_mels=cfg.n_mels))(audio).astype(jnp.bfloat16)
        feats = whisper.encode(cfg, params, mel)
        return whisper.compute_cross_kv_quant(cfg, params, feats)

    @jax.jit
    def decode_phase(params, xkv, prompt):
        cache = whisper.init_kv_cache(cfg, prompt.shape[0],
                                      dtype=jnp.bfloat16,
                                      max_len=CACHE_LEN)
        logits, cache = whisper.decode(cfg, params, prompt, jnp.int32(0),
                                       cache, xkv)
        p = prompt.shape[1]

        def step(i, carry):
            last, cache = carry
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            logits, cache = whisper.decode(cfg, params, nxt[:, None],
                                           p + i, cache, xkv)
            return logits[:, -1], cache

        last, _ = jax.lax.fori_loop(0, steps, step,
                                    (logits[:, -1], cache))
        return last

    def fence(x):
        # Slice ON DEVICE before the host read — transferring a whole
        # leaf (e.g. the 1 GB int8 cross-KV) through the dev tunnel would
        # dominate the measurement.
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    def timeit(fn, *args, reps=3):
        fence(fn(*args))
        fence(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_enc = timeit(encode_phase, params, audio)
    xkv = encode_phase(params, audio)
    t_dec = timeit(decode_phase, params, xkv, prompt)

    per_step_ms = t_dec / steps * 1000
    audio_secs = B * 30.0
    print(f"model={model} B={B} steps={steps}")
    print(f"encode phase (mel+encoder+int8 xkv): {t_enc * 1000:.1f} ms "
          f"({t_enc / (t_enc + t_dec) * 100:.0f}%)")
    print(f"decode phase ({steps} steps):        {t_dec * 1000:.1f} ms "
          f"({per_step_ms:.2f} ms/step)")
    print(f"combined throughput: "
          f"{audio_secs / (t_enc + t_dec):.1f}x realtime/chip")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
