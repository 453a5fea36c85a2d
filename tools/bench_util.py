"""Shared micro-benchmark helpers for the tools/ measurement scripts.

On this environment's axon backend `jax.block_until_ready` can return
before execution finishes; the only reliable fence is a tiny
device→host read (same workaround as bench.py). `bench()` reports
min-of-iters wall time minus the measured per-dispatch tunnel overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def fence(out) -> None:
    """Force completion via a 1-element device→host read."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * (leaf.ndim - 1)][:1])


_DISPATCH_MS = None


def dispatch_overhead_ms() -> float:
    """Measured cost of one dispatch + fence through the tunnel."""
    global _DISPATCH_MS
    if _DISPATCH_MS is None:
        trivial = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8,), jnp.float32)
        fence(trivial(x))
        times = []
        for _ in range(5):
            t0 = time.monotonic()
            fence(trivial(x))
            times.append(time.monotonic() - t0)
        _DISPATCH_MS = min(times) * 1000.0
    return _DISPATCH_MS


def bench(fn, *args, iters: int = 5) -> float:
    """min-of-iters wall milliseconds minus the dispatch overhead."""
    fence(fn(*args))            # warm / compile
    times = []
    for _ in range(iters):
        t0 = time.monotonic()
        fence(fn(*args))
        times.append(time.monotonic() - t0)
    return max(0.0, min(times) * 1000.0 - dispatch_overhead_ms())
