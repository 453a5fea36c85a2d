"""Encoder attention kernel shootout at serving shapes.

The component profiler (tools/encoder_components.py) shows the flash
kernel costing 282 ms of the 853 ms B=32 large-v3 encode (~21% of the
MXU-ideal rate for the attention FLOPs; the projections around it run at
94% of peak). Candidates, all timed per 32-layer chain with the
dispatch-cancelled repeat trick:

  - production flash_attention at block 1536 (full row) / 768 / 512
  - splash attention (newer TPU kernel generation) with a key-padding
    mask
  - dense XLA attention (materialized scores; the pre-round-2 baseline)

Usage: python tools/encoder_attention_bench.py [model] [batch]
"""

import functools
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
    print(f"model={model} B={B} L={L} T={T} H={H} dh={dh} "
          f"backend={jax.devices()[0].platform}")

    q = jax.random.normal(rng, (B, H, T, dh), jnp.bfloat16) * 0.1
    ideal_ms = 2 * 2 * B * H * T * T * dh * 2 / 197e12 * 1000 * L
    print(f"MXU-ideal for {L} layers of attention FLOPs: "
          f"{ideal_ms:.0f} ms")

    def chain(att):
        def run(reps, q):
            def rep(_, q):
                def layer(q, _):
                    o = att(q, q, q)
                    return 0.999 * q + 0.001 * o.astype(q.dtype), None

                q, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return q

            return jax.lax.fori_loop(0, reps, rep, q)

        return jax.jit(run, static_argnums=0)

    # Production flash at several block sizes.
    for blk in (1536, 768, 512):
        os.environ["OPENHUSH_FLASH_BLOCK"] = str(blk)
        whisper._flash_block.cache_clear() if hasattr(
            whisper._flash_block, "cache_clear") else None
        t = timed_pair(chain(whisper._attend_full_flash), q)
        print(f"flash block={blk}:        {t:8.1f} ms "
              f"({ideal_ms / t * 100:.0f}% of ideal)")
    os.environ.pop("OPENHUSH_FLASH_BLOCK", None)

    # Dense XLA attention.
    t = timed_pair(chain(whisper._attend), q)
    print(f"dense XLA:               {t:8.1f} ms "
          f"({ideal_ms / t * 100:.0f}% of ideal)")

    # Splash attention with a key-padding mask (pad to 128 lanes).
    try:
        from jax.experimental.pallas.ops.tpu import (
            splash_attention as sa)

        Tp = -(-T // 128) * 128
        vmask = np.zeros((Tp, Tp), bool)
        vmask[:, :T] = True                   # pad keys invisible
        mh = sa.MultiHeadMask([sa.NumpyMask(vmask) for _ in range(H)])
        kernel = sa.make_splash_mha_single_device(mask=mh)

        def splash(qh, kh, vh):
            pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
            qp, kp, vp = (jnp.pad(a, pad) for a in (qh, kh, vh))
            out = jax.vmap(kernel)(qp * (dh ** -0.5), kp, vp)
            return out[:, :, :T]

        t = timed_pair(chain(splash), q)
        print(f"splash (NumpyMask pad):  {t:8.1f} ms "
              f"({ideal_ms / t * 100:.0f}% of ideal)")
        # Exact-length variant: T multiple of 128? If not, also measure
        # a FullMask at the padded length to isolate mask cost.
        mh_full = sa.MultiHeadMask(
            [sa.FullMask((Tp, Tp)) for _ in range(H)])
        kernel_f = sa.make_splash_mha_single_device(mask=mh_full)

        def splash_full(qh, kh, vh):
            pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
            qp, kp, vp = (jnp.pad(a, pad) for a in (qh, kh, vh))
            out = jax.vmap(kernel_f)(qp * (dh ** -0.5), kp, vp)
            return out[:, :, :T]

        t = timed_pair(chain(splash_full), q)
        print(f"splash (FullMask, pad):  {t:8.1f} ms "
              f"({ideal_ms / t * 100:.0f}% of ideal; pad keys VISIBLE "
              f"— shape probe only)")
    except Exception as e:  # noqa: BLE001
        print(f"splash unavailable: {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
