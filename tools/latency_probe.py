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


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main(*(sys.argv[1:2] or ["large-v3"]))
