"""Headline benchmark: large-v3 transcription throughput per TPU chip.

Measures the full compute path on real hardware — raw audio → fused log-mel
frontend → encoder → cross-KV → 128 KV-cached greedy decode steps — for a
batch of 30 s windows (the continuous-batching serving shape). 128 decode
steps/window is deliberately conservative: real speech yields ~75-90 tokens
per 30 s window, so reported throughput UNDERSTATES end-to-end performance.
Headline batch is 32 (larger batches amortize the per-step weight read;
measured +13% over B=16); the serving section runs 16 slots — 32 slots of
device state don't fit this chip's HBM — and reports its overhead ratio
against a raw loop at the same batch.

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
BATCH = int(os.environ.get("OPENHUSH_BENCH_BATCH", "32"))
# Serving runs fewer slots than the raw headline batch: 32 slots of
# device state alongside the weights exhausts this chip's HBM (measured
# RESOURCE_EXHAUSTED), and the serving/raw ratio is only meaningful at
# matched batch — so serving is compared against a raw run at the same B.
SERVE_SLOTS = int(os.environ.get("OPENHUSH_BENCH_SERVE_SLOTS",
                                 str(min(BATCH, 16))))
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


def serving_bench(cfg, params, *, draft=None, k_spec=4,
                  force_accept=False, n_windows=None):
    """End-to-end SERVING throughput: B×30 s windows through the real
    EngineServer (prep thread path run synchronously: preprocess → fused
    mel → encode → int8 cross-KV → admission → batched decode → harvest).
    EOT is suppressed so every window decodes exactly DECODE_STEPS
    content tokens — the same per-window work as the raw loop, making
    serving_x / raw_x the true serving-overhead ratio.

    Returns (x_realtime, tokens_per_sec, accept_rate)."""
    from openhush_tpu.runtime.server import EngineServer

    if force_accept:
        os.environ["OPENHUSH_SPEC_FORCE_ACCEPT"] = "1"
    else:
        os.environ.pop("OPENHUSH_SPEC_FORCE_ACCEPT", None)
    prompt_len = 4           # [sot, lang, transcribe, notimestamps]
    server = EngineServer(
        cfg, params, n_slots=SERVE_SLOTS, inner_steps=8,
        max_decode_len=prompt_len + DECODE_STEPS + 1,
        temperatures=(0.0,), logprob_threshold=-1e9,
        no_speech_threshold=2.0,
        draft=draft, k_spec=k_spec,
        harvest_every=int(os.environ.get("OPENHUSH_BENCH_HARVEST",
                                         "4")),
        max_admissions_per_turn=SERVE_SLOTS)
    # Suppress EOT: windows run to the decode budget deterministically.
    eot = server.tokenizer.special.eot
    server._suppress = server._suppress.at[eot].set(True)

    n_windows = n_windows or 2 * SERVE_SLOTS
    rng = np.random.default_rng(1)
    audios = [np.asarray(0.1 * rng.standard_normal(mel_ops.N_SAMPLES),
                         np.float32) for _ in range(min(4, n_windows))]

    def run(n):
        sids = []
        for i in range(n):
            sid = server.open_session()
            sids.append(sid)
            server.submit_window(sid, audios[i % len(audios)],
                                 window_id=i, language="en",
                                 timestamps=False)
        got, total_tokens = 0, 0
        iters0 = server.spec_iters
        t0 = time.perf_counter()
        while got < n:
            server.run_once()
            for sid in sids:
                r = server.poll(sid)
                if r is not None:
                    got += 1
                    total_tokens += max(len(r.tokens), 1)
        wall = time.perf_counter() - t0
        for sid in sids:
            server.close_session(sid)
        return wall, total_tokens, server.spec_iters - iters0

    # Warm with a FULL batch so every admit-group size the main run uses
    # is compiled outside the timed window.
    run(min(SERVE_SLOTS, n_windows))
    wall, total_tokens, spec_iters = run(n_windows)
    audio_secs = n_windows * WINDOW_SECS
    # Free this server's device state eagerly: three serving configs run
    # back-to-back, and ~3.5 GB of slot state each OOMs a 16 GB chip if
    # the old buffers outlive the next construction.
    server.state = None
    import gc
    gc.collect()
    if draft is not None and spec_iters:
        # Accepted tokens per spec iteration → implied accept rate:
        # emitted/iter = 1 + (k-1)*accept. spec_iters counts iterations
        # actually dispatched (deep steps included); it overcounts when
        # slots sit partially full, so this UNDERSTATES acceptance — it
        # is exact in the fully-batched steady state.
        per_iter = total_tokens / (spec_iters * SERVE_SLOTS)
        accept = max(0.0, min(1.0, (per_iter - 1) / max(k_spec - 1, 1)))
    else:
        accept = float("nan")
    os.environ.pop("OPENHUSH_SPEC_FORCE_ACCEPT", None)
    return audio_secs / wall, total_tokens / wall, accept


def main() -> None:
    cfg = get_config(MODEL)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    if os.environ.get("OPENHUSH_BENCH_INT8_W") == "1":
        # Same knob as the engine's OPENHUSH_INT8_WEIGHTS production path.
        params = whisper.quantize_decoder_weights(params)
    rng = np.random.default_rng(0)
    bench_step = make_bench_step(cfg)

    def raw_x_realtime(batch: int) -> float:
        """min-of-3 raw-loop throughput at a given batch."""
        audio = jnp.asarray(0.1 * rng.standard_normal(
            (batch, mel_ops.N_SAMPLES)), jnp.float32)
        prompt = jnp.tile(jnp.asarray([[50258, 50259, 50360]], jnp.int32),
                          (batch, 1))

        def run_sync():
            # Force completion with a host transfer: on this env's axon
            # backend block_until_ready returns before execution finishes,
            # so a (tiny) device→host read is the only reliable fence.
            return np.asarray(bench_step(params, audio, prompt)[0, :1])

        run_sync()  # warm up / compile
        run_sync()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_sync()
            times.append(time.perf_counter() - t0)
        return batch * WINDOW_SECS / min(times)

    x_realtime = raw_x_realtime(BATCH)
    out = {
        "metric": f"{MODEL}_throughput_b{BATCH}_d{DECODE_STEPS}",
        "value": round(x_realtime, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_realtime / BASELINE_X_REALTIME, 3),
    }

    # End-to-end SERVING numbers (VERDICT r2 #2): the same per-window work
    # through the real EngineServer (admission + batched decode + harvest),
    # plain and speculative. Guarded: the raw headline always prints, and
    # a wall-clock budget skips remaining configs when the dev tunnel is
    # in a degraded phase (dispatches can take seconds there).
    deadline = time.monotonic() + float(
        os.environ.get("OPENHUSH_BENCH_BUDGET_S", "1500"))
    if os.environ.get("OPENHUSH_BENCH_RAW_ONLY") != "1":
        try:
            import dataclasses

            # Serving runs SERVE_SLOTS slots; its overhead ratio is
            # against a raw loop at the SAME batch.
            raw_serve = (x_realtime if SERVE_SLOTS == BATCH
                         else raw_x_realtime(SERVE_SLOTS))
            if SERVE_SLOTS != BATCH:
                out[f"raw_b{SERVE_SLOTS}_x_realtime"] = round(raw_serve, 2)
            serving_x, tps, _ = serving_bench(cfg, params)
            out["serving_x_realtime"] = round(serving_x, 2)
            out["serving_frac_of_raw"] = round(serving_x / raw_serve, 3)
            out["serving_tokens_per_sec"] = round(tps, 1)

            if time.monotonic() > deadline:
                raise TimeoutError("bench budget exhausted after plain "
                                   "serving (degraded dispatch latency)")
            if os.environ.get("OPENHUSH_BENCH_SPEC", "1") == "1":
                # Turbo-shaped draft (4-layer decoder sharing the
                # encoder). Random init → near-zero natural acceptance;
                # force_accept measures the accept=1.0 endpoint through
                # the identical compute path. Real speedup at accept r
                # interpolates linearly in accepted-tokens/iteration.
                if MODEL == "large-v3":
                    dcfg = get_config("large-v3-turbo")
                else:
                    dcfg = dataclasses.replace(
                        cfg, name=f"{cfg.name}-draft4",
                        n_text_layer=min(4, cfg.n_text_layer))
                dparams = whisper.init_params(dcfg, jax.random.PRNGKey(5),
                                              dtype=jnp.bfloat16)
                draft = (dcfg, dparams)
                lo_x, _, lo_acc = serving_bench(cfg, params, draft=draft)
                out["spec_serving_x_accept0"] = round(lo_x, 2)
                out["spec_measured_accept_random_draft"] = round(lo_acc, 3)
                if time.monotonic() > deadline:
                    raise TimeoutError("bench budget exhausted before "
                                       "force-accept config")
                hi_x, _, _ = serving_bench(cfg, params, draft=draft,
                                           force_accept=True)
                out["spec_serving_x_accept1"] = round(hi_x, 2)
                # Linear interpolation between the two MEASURED endpoints
                # (tokens/iteration is linear in accept).
                est08 = lo_x + 0.8 * (hi_x - lo_x)
                out["spec_serving_x_accept0.8_interp"] = round(est08, 2)
                out["spec_serving_speedup_accept0.8"] = round(
                    est08 / serving_x, 2)
        except Exception as e:  # noqa: BLE001 — headline must survive
            out["serving_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
