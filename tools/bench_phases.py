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

# OPENHUSH_BENCH_CPU=1: smoke-test off-chip (the axon sitecustomize
# force-registers TPU regardless of JAX_PLATFORMS; only jax.config
# overrides it — same trick as bench.py / tests/).
if os.environ.get("OPENHUSH_BENCH_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.ops import frontend_pallas, mel as mel_ops

CACHE_LEN = 256


def roofline() -> int:
    """Measured ACHIEVABLE HBM bandwidth on this chip through this
    harness — the honest denominator for any 'decode is at X% of HBM'
    claim (spec-sheet numbers ignore the tunnel + XLA realities).

    A single read-reduce is useless through the dev tunnel: 4 GB at
    ~800 GB/s is 5 ms of HBM time under ~24 ms of per-dispatch relay
    (first attempt measured "150 GB/s" — i.e. the tunnel, not the
    chip). So the read repeats R times INSIDE one dispatch via a
    fori_loop whose body depends on the carry (a carry-max —
    XLA can neither hoist nor simplify away, so every iteration
    re-reads x and fuses into the reduce: one full HBM pass, no materialized
    intermediate), and the bandwidth is computed from the DIFFERENCE
    between two repeat counts, which cancels dispatch overhead and any
    fixed per-dispatch cost exactly."""
    from functools import partial

    gb = float(os.environ.get("OPENHUSH_ROOFLINE_GB", "4"))
    n = int(gb * 1e9 / 2)                     # bf16 elements
    x = jnp.ones((n,), jnp.bfloat16)

    @partial(jax.jit, static_argnums=1)
    def reread(a, reps):
        # max(a, tiny·acc) — carry-dependent and NOT algebraically
        # hoistable out of the reduce (sum(a+c) would be: = sum(a)+n·c),
        # numerically exact since tiny·acc ≪ 1 ≤ a.
        def body(_, acc):
            return acc + jnp.sum(
                jnp.maximum(a.astype(jnp.float32), acc * 1e-30))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    def timed(reps: int) -> float:
        np.asarray(reread(x, reps))           # compile + warm
        np.asarray(reread(x, reps))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(reread(x, reps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    r_lo, r_hi = 8, 32
    t_lo, t_hi = timed(r_lo), timed(r_hi)
    for reps, t in ((r_lo, t_lo), (r_hi, t_hi)):
        print(f"read-reduce {gb:.0f} GB × {reps} reps: {t*1000:.0f} ms "
              f"(incl. dispatch) = {reps * x.nbytes / t / 1e9:.0f} GB/s")
    bw = (r_hi - r_lo) * x.nbytes / max(t_hi - t_lo, 1e-9) / 1e9
    print(f"achievable HBM read bandwidth (dispatch-cancelled, "
          f"Δ{r_hi - r_lo} reps × {gb:.0f} GB): {bw:.0f} GB/s")
    return 0


def main() -> int:
    if "--roofline" in sys.argv:
        return roofline()
    model = sys.argv[1] if len(sys.argv) > 1 else "large-v3"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    int8_w = os.environ.get("OPENHUSH_BENCH_INT8_W") == "1"
    int8_cache = os.environ.get("OPENHUSH_BENCH_INT8_CACHE") == "1"
    if int8_w:
        params = whisper.quantize_decoder_weights(params)
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
        if int8_cache:
            cache = whisper.init_quant_kv_cache(cfg, prompt.shape[0],
                                                max_len=CACHE_LEN)
        else:
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

    # Effective decode bandwidth: bytes every step must read from HBM
    # (decoder weights + full self-cache buffer + int8 cross-KV+scales),
    # divided by measured per-step time.
    import jax.tree_util as jtu
    dec_w_bytes = sum(
        leaf.nbytes for leaf in jtu.tree_leaves(params["decoder"]))
    selfc_bytes = (2 * cfg.n_text_layer * B * CACHE_LEN
                   * cfg.n_text_state * (1 if int8_cache else 2))
    if int8_cache:
        selfc_bytes += (2 * cfg.n_text_layer * B * CACHE_LEN
                        * cfg.n_text_head * 4)          # scales
    A = cfg.n_audio_ctx
    xkv_bytes = (2 * cfg.n_text_layer * B * A * cfg.n_text_state
                 + 2 * cfg.n_text_layer * B * A * cfg.n_text_head * 4)
    step_bytes = dec_w_bytes + selfc_bytes + xkv_bytes
    eff_gbs = step_bytes / (t_dec / steps) / 1e9

    print(f"model={model} B={B} steps={steps} int8_w={int8_w} "
          f"int8_cache={int8_cache}")
    print(f"per-step read set: weights {dec_w_bytes/1e6:.0f} MB + "
          f"self-cache {selfc_bytes/1e6:.0f} MB + "
          f"cross-KV {xkv_bytes/1e6:.0f} MB = {step_bytes/1e6:.0f} MB")
    print(f"effective decode bandwidth: {eff_gbs:.0f} GB/s")
    print(f"encode phase (mel+encoder+int8 xkv): {t_enc * 1000:.1f} ms "
          f"({t_enc / (t_enc + t_dec) * 100:.0f}%)")
    print(f"decode phase ({steps} steps):        {t_dec * 1000:.1f} ms "
          f"({per_step_ms:.2f} ms/step)")
    print(f"combined throughput: "
          f"{audio_secs / (t_enc + t_dec):.1f}x realtime/chip")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
