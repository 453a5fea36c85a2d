"""bench.py serving-mode machinery on the test model (nightly lane):
windows through the real EngineServer with deterministic decode budget,
plain + speculative, accept accounting. The on-chip numbers come from
the driver's bench run; this pins the harness itself."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_serving_bench_plain_and_spec(monkeypatch):
    monkeypatch.setenv("OPENHUSH_BENCH_MODEL", "test")
    monkeypatch.setenv("OPENHUSH_BENCH_BATCH", "2")
    monkeypatch.setenv("OPENHUSH_BENCH_DECODE_STEPS", "12")
    sys.path.insert(0, REPO)
    for mod in ("bench",):
        sys.modules.pop(mod, None)
    import importlib

    import bench
    importlib.reload(bench)
    import dataclasses

    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config

    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    x, tps, acc = bench.serving_bench(cfg, params, n_windows=3)
    assert x > 0 and tps > 0

    dcfg = dataclasses.replace(cfg, name="t-draft", n_text_layer=1)
    dparams = whisper.init_params(dcfg, jax.random.PRNGKey(5),
                                  dtype=jnp.float32)
    x0, _, acc0 = bench.serving_bench(cfg, params, draft=(dcfg, dparams),
                                      k_spec=3, n_windows=3)
    x1, _, _ = bench.serving_bench(cfg, params, draft=(dcfg, dparams),
                                   k_spec=3, n_windows=3,
                                   force_accept=True)
    assert x0 > 0 and x1 > 0
    assert 0.0 <= acc0 <= 1.0
    # force-accept is constructor-only (VERDICT r3 weak #3): the bench
    # must not leak a process-wide env knob that breaks token-exactness.
    assert os.environ.get("OPENHUSH_SPEC_FORCE_ACCEPT") is None
