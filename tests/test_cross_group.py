"""Grouped cross-attention (decode cross_group): the K rows of a beam
group share one cross-KV row. Must match the per-row tiled formulation —
bit-exactly in the int8 path (integer MXU accumulation is order-free),
to reduction noise in bf16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import get_config


def _setup(seed=0, cfg_name="tiny", G=3, K=4, T_cache=32, pos0=7):
    cfg = get_config(cfg_name)
    key = jax.random.PRNGKey(seed)
    params = whisper.init_params(cfg, key, dtype=jnp.float32)
    GK = G * K
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(
        rng.standard_normal((G, cfg.n_audio_ctx, cfg.n_audio_state)),
        jnp.float32) * 0.3
    xkv_g = whisper.compute_cross_kv_quant(cfg, params, feats)
    tile = lambda a: jnp.repeat(a, K, axis=1)
    xkv_t = whisper.QuantKVCache(tile(xkv_g.k), tile(xkv_g.k_scale),
                                 tile(xkv_g.v), tile(xkv_g.v_scale))
    cache = whisper.init_kv_cache(cfg, GK, dtype=jnp.float32,
                                  max_len=T_cache)
    ck = jnp.asarray(rng.standard_normal(cache.k.shape), jnp.float32) * 0.2
    cv = jnp.asarray(rng.standard_normal(cache.v.shape), jnp.float32) * 0.2
    cache = whisper.KVCache(ck, cv)
    toks = jnp.asarray(rng.integers(0, cfg.n_vocab, (GK, 1)), jnp.int32)
    pos = jnp.full((GK,), pos0, jnp.int32)
    return cfg, params, cache, xkv_g, xkv_t, toks, pos, K


def test_grouped_matches_tiled_int8():
    cfg, params, cache, xkv_g, xkv_t, toks, pos, K = _setup()
    lg_g, c_g = whisper.decode(cfg, params, toks, pos, cache, xkv_g,
                               cross_group=K)
    lg_t, c_t = whisper.decode(cfg, params, toks, pos, cache, xkv_t)
    # int8 cross scores/probs accumulate in integers — identical values;
    # only softmax's fp32 sum order can differ between the shapes.
    np.testing.assert_allclose(np.asarray(lg_g), np.asarray(lg_t),
                               rtol=0, atol=1e-4)
    assert np.argmax(np.asarray(lg_g), -1).tolist() == \
        np.argmax(np.asarray(lg_t), -1).tolist()
    # The self-cache delta write is unaffected by the cross formulation.
    np.testing.assert_allclose(np.asarray(c_g.k), np.asarray(c_t.k),
                               rtol=0, atol=1e-5)


def test_grouped_rows_independent():
    """Zeroing group 1's cross-KV must not touch group 0's logits."""
    cfg, params, cache, xkv_g, _, toks, pos, K = _setup(G=2, K=3)
    lg_a, _ = whisper.decode(cfg, params, toks, pos, cache, xkv_g,
                             cross_group=K)
    z = whisper.QuantKVCache(
        xkv_g.k.at[:, 1].set(0), xkv_g.k_scale.at[:, 1].set(0),
        xkv_g.v.at[:, 1].set(0), xkv_g.v_scale.at[:, 1].set(0))
    lg_b, _ = whisper.decode(cfg, params, toks, pos, cache, z,
                             cross_group=K)
    np.testing.assert_array_equal(np.asarray(lg_a[:K]),
                                  np.asarray(lg_b[:K]))
    assert np.abs(np.asarray(lg_a[K:]) - np.asarray(lg_b[K:])).max() > 0


def test_cross_group_validation():
    cfg, params, cache, xkv_g, _, toks, pos, K = _setup()
    with pytest.raises(ValueError, match="not divisible"):
        whisper.decode(cfg, params, toks[:-1], pos[:-1],
                       whisper.KVCache(cache.k[:, :-1], cache.v[:, :-1]),
                       xkv_g, cross_group=K)
    # One lane tile: cross_group·S·H must stay ≤ 128.
    big = (128 // cfg.n_text_head) + 1          # smallest violating K
    cache_b = whisper.init_kv_cache(cfg, big, dtype=jnp.float32,
                                    max_len=8)
    toks_b = jnp.zeros((big, 1), jnp.int32)
    xkv_1 = whisper.QuantKVCache(xkv_g.k[:, :1], xkv_g.k_scale[:, :1],
                                 xkv_g.v[:, :1], xkv_g.v_scale[:, :1])
    with pytest.raises(ValueError, match="128"):
        whisper.decode(cfg, params, toks_b, jnp.zeros((big,), jnp.int32),
                       cache_b, xkv_1, cross_group=big)


def test_beam_grouped_gate_per_config():
    """The grouped-step gate must track K·H ≤ 128 for the real model
    family (beam.py and beam_batcher.py both route through it): large-v3
    has 20 text heads → grouped through K=6, fallback from K=7; tiny has
    6 heads → grouped far past any practical beam width."""
    large = get_config("large-v3")
    assert large.n_text_head == 20
    assert whisper.beam_grouped_ok(large, 5)       # the default K
    assert whisper.beam_grouped_ok(large, 6)
    assert not whisper.beam_grouped_ok(large, 7)   # 140 lanes > 128
    tiny = get_config("tiny")
    assert whisper.beam_grouped_ok(tiny, 21)       # 126 ≤ 128
    assert not whisper.beam_grouped_ok(tiny, 22)
