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


def test_save_lkg_merges_and_drops_stale_errors(tmp_path, monkeypatch):
    """save_lkg must merge over the existing record (a truncating write
    after the headline degraded the committed LKG when a run died
    mid-serving) and drop *_error keys the new run didn't re-report."""
    import json

    lkg = tmp_path / "lkg.json"
    monkeypatch.setenv("OPENHUSH_BENCH_LKG", str(lkg))
    monkeypatch.setenv("OPENHUSH_BENCH_CPU", "1")
    import importlib

    import bench
    importlib.reload(bench)
    lkg.write_text(json.dumps({
        "metric": "m", "value": 1.0, "serving_x_realtime": 250.0,
        "serving_error": "TimeoutError: old", "stale_error": "x"}))
    monkeypatch.setattr(bench, "CPU_MODE", False)

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(bench.jax, "devices", lambda: [_Dev()])
    bench.save_lkg({"metric": "m", "value": 2.0, "unit": "x",
                    "vs_baseline": 0.2})
    rec = json.loads(lkg.read_text())
    assert rec["value"] == 2.0
    assert rec["serving_x_realtime"] == 250.0      # survives the merge
    assert "serving_error" not in rec and "stale_error" not in rec
    assert "stale_from" in rec

    # CPU fallback (plugin failed init) must never overwrite the record.
    class _Cpu:
        platform = "cpu"

    monkeypatch.setattr(bench.jax, "devices", lambda: [_Cpu()])
    bench.save_lkg({"metric": "m", "value": 9.9})
    assert json.loads(lkg.read_text())["value"] == 2.0


def test_longform_bench_stage(monkeypatch):
    """longform_bench (product-path end-to-end stage) runs on the test
    model: single-stream seek loop + batched-across-files driver, sane
    metric keys. Engine-module guard constants are restored afterwards
    (bench pins them process-wide by design; tests must not leak)."""
    monkeypatch.setenv("OPENHUSH_BENCH_MODEL", "test")
    monkeypatch.setenv("OPENHUSH_BENCH_DECODE_STEPS", "12")
    monkeypatch.setenv("OPENHUSH_BENCH_CPU", "1")
    sys.path.insert(0, REPO)
    sys.modules.pop("bench", None)
    import importlib

    import bench
    importlib.reload(bench)
    import jax
    import jax.numpy as jnp

    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.runtime import engine as engine_mod

    saved = (engine_mod.TEMPERATURES, engine_mod.LOGPROB_THRESHOLD,
             engine_mod.NO_SPEECH_THRESHOLD)
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    try:
        out = bench.longform_bench(cfg, params, single_secs=40,
                                   n_files=2, file_secs=35)
    finally:
        (engine_mod.TEMPERATURES, engine_mod.LOGPROB_THRESHOLD,
         engine_mod.NO_SPEECH_THRESHOLD) = saved
    assert out["longform_single_x_realtime"] > 0
    assert out["longform_batch_x_realtime"] > 0
    assert out["longform_batch_files"] == 2
    assert out["longform_single_windows"] >= 2
    assert out["longform_batch_windows"] >= 2
    assert out["longform_vs_ref_worked_example"] > 0
