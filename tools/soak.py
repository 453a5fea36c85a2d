"""Server stability soak: N windows through the continuous-batching server.

Measured 2026-08: 100/100 5 s windows complete through 4 slots with
large-v3-turbo on a v5e chip — no leaks, no stalls, clean shutdown.
(Sustained-throughput numbers from this harness reflect the dev
environment's ~200 ms-per-dispatch tunnel latency, not chip compute; use
bench.py for the compute-bound figure. On directly attached TPUs, dispatch
is sub-millisecond and sustained throughput tracks bench.py.)
"""

import sys
import time

import numpy as np


def main(model: str = "large-v3-turbo", n: int = 100,
         slots: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.runtime.server import EngineServer
    from openhush_tpu.text.tokenizer import WhisperTokenizer

    cfg = get_config(model)
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.bfloat16)
    server = EngineServer(cfg, params, n_slots=slots, inner_steps=8,
                          tokenizer=WhisperTokenizer(cfg.n_langs),
                          audio_ctx=512, max_decode_len=128)
    server.start()
    rng = np.random.default_rng(0)
    sids = [server.open_session() for _ in range(slots)]
    t0 = time.monotonic()
    for i in range(n):
        audio = (0.1 * rng.standard_normal(16000 * 5)).astype(np.float32)
        server.submit_window(sids[i % slots], audio, window_id=i,
                             language="en", timestamps=False)
    done = 0
    deadline = time.monotonic() + 1800
    while done < n and time.monotonic() < deadline:
        for sid in sids:
            if server.poll(sid) is not None:
                done += 1
        time.sleep(0.01)
    wall = time.monotonic() - t0
    server.stop()
    audio_secs = done * 5.0
    print(f"soak: {done}/{n} windows in {wall:.1f}s "
          f"({done / wall:.2f} windows/s, "
          f"{audio_secs / wall:.1f}x realtime sustained)")
    if done != n:
        sys.exit(1)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main(*(sys.argv[1:2] or ["large-v3-turbo"]),
         *(int(a) for a in sys.argv[2:4]))
