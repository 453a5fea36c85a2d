"""HBM slot budgeter: slot/beam-group device state is computed exactly
from cfg (batcher.state_bytes / beam_batcher.state_bytes) and refused at
construction when it cannot fit next to the weights — replacing the
round-3 folklore ("32 slots exhaust HBM", a bench comment discovered as a
mid-run RESOURCE_EXHAUSTED). VERDICT r3 weak #6 / next #4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.runtime import batcher, beam_batcher
from openhush_tpu.runtime.server import EngineServer, device_hbm_limit
from openhush_tpu.runtime.beam_server import BeamEngineServer
from openhush_tpu.text.tokenizer import WhisperTokenizer

NO_GUARDS = dict(temperatures=(0.0,), logprob_threshold=-1e9,
                 no_speech_threshold=2.0)


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    return cfg, params, WhisperTokenizer(cfg.n_langs)


def _nbytes(tree) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree.leaves(tree))


def test_state_bytes_matches_real_allocation(setup):
    """eval_shape-computed bytes == bytes of the actually-allocated state
    (per-buffer logical sizes; device padding is the runtime's concern)."""
    cfg, _, _ = setup
    for kw in (dict(), dict(int8_self_cache=True), dict(max_len=64),
               dict(audio_ctx=128)):
        predicted = batcher.state_bytes(cfg, 4, **kw)
        actual = _nbytes(batcher.init_state(cfg, 4, **kw))
        assert predicted == actual, kw
    predicted = beam_batcher.state_bytes(cfg, 2, 3, max_len=64)
    actual = _nbytes(beam_batcher.init_state(cfg, 2, 3, max_len=64))
    assert predicted == actual


def test_state_bytes_scales_with_knobs(setup):
    cfg, _, _ = setup
    base = batcher.state_bytes(cfg, 8, max_len=128)
    assert batcher.state_bytes(cfg, 16, max_len=128) > base
    assert batcher.state_bytes(cfg, 8, max_len=64) < base
    # int8 self-cache halves the dominant bf16 self-cache read
    assert batcher.state_bytes(cfg, 8, max_len=128,
                               int8_self_cache=True) < base
    # A K-beam group carries K beams of self-cache but shares ONE
    # cross-KV copy (grouped flat cross-attention), so it costs more
    # than a greedy slot yet strictly less than K greedy slots.
    beam5 = beam_batcher.state_bytes(cfg, 8, 5, max_len=128)
    assert base < beam5 < 5 * base
    assert beam5 > beam_batcher.state_bytes(cfg, 8, 2, max_len=128)


def test_refuses_oversized_slot_count(setup, monkeypatch):
    cfg, params, tok = setup
    state8 = batcher.state_bytes(cfg, 8, max_len=128,
                                 audio_ctx=cfg.n_audio_ctx)
    # A fake chip whose budget fits the weights plus ~2 slots.
    limit = int((_nbytes(params) + state8 // 4) / 0.85)
    monkeypatch.setenv("OPENHUSH_HBM_BYTES", str(limit))
    assert device_hbm_limit() == limit
    with pytest.raises(ValueError) as ei:
        EngineServer(cfg, params, n_slots=8, max_decode_len=128,
                     tokenizer=tok, dtype=jnp.float32, **NO_GUARDS)
    msg = str(ei.value)
    assert "largest slot count that fits" in msg
    # The suggested count must itself construct cleanly.
    fits = int(msg.rsplit(":", 1)[1])
    assert 1 <= fits < 8
    srv = EngineServer(cfg, params, n_slots=fits, max_decode_len=128,
                       tokenizer=tok, dtype=jnp.float32, **NO_GUARDS)
    assert srv.n_slots == fits


def test_refuses_oversized_beam_groups(setup, monkeypatch):
    cfg, params, tok = setup
    g4 = beam_batcher.state_bytes(cfg, 4, 5, max_len=128,
                                  audio_ctx=cfg.n_audio_ctx)
    limit = int((_nbytes(params) + g4 // 4) / 0.85)
    monkeypatch.setenv("OPENHUSH_HBM_BYTES", str(limit))
    with pytest.raises(ValueError, match="beam-group"):
        BeamEngineServer(cfg, params, beam_size=5, n_slots=4,
                         max_decode_len=128, tokenizer=tok,
                         dtype=jnp.float32, **NO_GUARDS)


def test_device_kind_capacity_fallback():
    """The axon tunnel's TPU exposes no memory_stats (observed round 4:
    bytes_limit absent → budgeter silently off on the real chip); the
    published-capacity table by device_kind must catch it."""
    from openhush_tpu.runtime.server import _hbm_by_device_kind
    assert _hbm_by_device_kind("TPU v5 lite") == 16 << 30
    assert _hbm_by_device_kind("TPU v5e") == 16 << 30
    assert _hbm_by_device_kind("TPU v5p") == 95 << 30
    assert _hbm_by_device_kind("TPU v4") == 32 << 30
    assert _hbm_by_device_kind("") is None
    assert _hbm_by_device_kind("Quantum Q9") is None


def test_budgeter_disabled_when_capacity_unknown(setup, monkeypatch):
    """CPU test backend: no HBM limit → no refusal (budgeting is a real-
    chip concern)."""
    cfg, params, tok = setup
    monkeypatch.delenv("OPENHUSH_HBM_BYTES", raising=False)
    assert device_hbm_limit() is None
    srv = EngineServer(cfg, params, n_slots=8, max_decode_len=128,
                       tokenizer=tok, dtype=jnp.float32, **NO_GUARDS)
    assert srv.n_slots == 8


def test_fallback_state_bytes_counts_tiled_xkv_transient(setup,
                                                         monkeypatch):
    """K·H > one lane tile: the gather-formulation step materializes a
    K-tiled cross-KV transient inside every dispatch (jnp.repeat in
    _step_impl) that a walk of the STORED state cannot see; the budgeter
    must count it or it admits group counts that OOM on the first step."""
    cfg, _, _ = setup
    K = 5
    grouped = beam_batcher.state_bytes(cfg, 4, K, max_len=128)
    state = beam_batcher.init_state(cfg, 4, K, max_len=128)
    assert grouped == _nbytes(state)        # grouped: stored state only
    xkv_bytes = _nbytes((state.xkv_k, state.xkv_ks,
                         state.xkv_v, state.xkv_vs))
    monkeypatch.setattr(whisper, "beam_grouped_ok",
                        lambda _cfg, _k: False)
    fallback = beam_batcher.state_bytes(cfg, 4, K, max_len=128)
    # the tiled transient is exactly K extra cross-KV copies
    assert fallback == grouped + K * xkv_bytes
