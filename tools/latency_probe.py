"""First-partial latency probe (north star: <500 ms p50 in streaming mode).

Runs the continuous-batching engine server with large-v3 on the current
device, submits 5 s windows, and reports submit→first-content-token
latency. Measured on a v5e chip (2026-08): p50 202 ms, p90 264 ms.

Note: window *completion* latency in the axon-tunnelled dev environment is
dominated by per-dispatch relay overhead (~200 ms/dispatch); on directly
attached TPUs dispatch is sub-millisecond and completion tracks
steps × ~13 ms.
"""

import sys
import time

import numpy as np


def main(model: str = "large-v3", n: int = 10) -> None:
    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.runtime.server import EngineServer
    from openhush_tpu.text.tokenizer import WhisperTokenizer

    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    server = EngineServer(cfg, params, n_slots=8, inner_steps=4,
                          tokenizer=WhisperTokenizer(cfg.n_langs))
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)

    sid = server.open_session()
    server.submit_window(sid, audio, window_id=0, language="en",
                         timestamps=False)
    t0 = time.monotonic()
    while server.poll(sid) is None:
        server.run_once()
        if time.monotonic() - t0 > 600:
            print("warmup timed out", file=sys.stderr)
            return
    lat = []
    for i in range(n):
        server.submit_window(sid, audio, window_id=i + 1, language="en",
                             timestamps=False)
        res = None
        while res is None:
            server.run_once()
            res = server.poll(sid)
        lat.append(res.first_token_latency)
    lat.sort()
    print(f"first-partial latency over {n} windows: "
          f"p50 {lat[n // 2] * 1000:.0f} ms, "
          f"p90 {lat[int(n * 0.9)] * 1000:.0f} ms")


def admission_stall(model: str = "large-v3", joiners: int = 8) -> None:
    """Measure the decode-clock stall an ACTIVE session sees while other
    sessions join (async-admission acceptance: stall during admission
    must stay within ~1 inner_steps dispatch, not the full
    mel+encode+cross-KV+detect cost the serial path paid).

    Method: one session decodes while peek() is sampled at 2 ms; the max
    gap between token-count advances is compared before vs while
    `joiners` windows are being admitted concurrently."""
    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.runtime.server import EngineServer
    from openhush_tpu.text.tokenizer import WhisperTokenizer

    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    server = EngineServer(cfg, params, n_slots=joiners + 1, inner_steps=4,
                          tokenizer=WhisperTokenizer(cfg.n_langs),
                          max_decode_len=448)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)

    # Warm up all compiled shapes: single window (admit/step/harvest),
    # then a full joiner burst (batched prep buckets + row-admit).
    sid = server.open_session()
    server.submit_window(sid, audio, window_id=0, language="en",
                         timestamps=False)
    server.start()
    t0 = time.monotonic()
    while server.poll(sid, timeout=1.0) is None:
        if time.monotonic() - t0 > 900:
            print("warmup timed out", file=sys.stderr)
            return
    warm = [server.open_session() for _ in range(joiners)]
    for j, wsid in enumerate(warm):
        server.submit_window(wsid, audio, window_id=100 + j,
                             language="en", timestamps=False)
    for wsid in warm:
        if server.poll(wsid, timeout=900) is None:
            print("bucket warmup timed out", file=sys.stderr)
            return
        server.close_session(wsid)

    # Active session under observation.
    server.submit_window(sid, audio, window_id=1, language="en",
                         timestamps=False)
    advances: list[tuple[float, int]] = []
    joined_at = None
    t0 = time.monotonic()
    last_len = -1
    while True:
        now = time.monotonic() - t0
        toks = server.peek(sid)
        if toks is not None and len(toks) != last_len:
            last_len = len(toks)
            advances.append((now, last_len))
        if joined_at is None and (last_len >= 2 or now > 0.4):
            # Join as soon as the observed decode is underway — with the
            # round-3 serving speedups a 5 s window can finish in well
            # under the old fixed 0.4 s trigger.
            joined_at = now
            others = [server.open_session() for _ in range(joiners)]
            for j, osid in enumerate(others):
                server.submit_window(osid, audio, window_id=10 + j,
                                     language="en", timestamps=False)
        if server.poll(sid, timeout=0) is not None:
            break
        if now > 300:
            print("observation timed out", file=sys.stderr)
            return
        time.sleep(0.002)
    server.stop()

    def max_gap(pairs):
        ts = [t for t, _ in pairs]
        return max((b - a for a, b in zip(ts, ts[1:])), default=0.0)

    if joined_at is None:
        print("observed window finished before any join happened; "
              "nothing to measure", file=sys.stderr)
        return
    before = [(t, l) for t, l in advances if t <= joined_at]
    during = [(t, l) for t, l in advances if t > joined_at]
    print(f"decode-clock max gap: before admissions "
          f"{max_gap(before) * 1000:.0f} ms, during {joiners} admissions "
          f"{max_gap(during) * 1000:.0f} ms "
          f"(dispatch ≈ {np.median(np.diff([t for t, _ in advances])) * 1000:.0f} ms)")


if __name__ == "__main__":
    sys.path.insert(0, ".")
    if "--admission" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        admission_stall(*(args[:1] or ["large-v3"]))
    else:
        main(*(sys.argv[1:2] or ["large-v3"]))
