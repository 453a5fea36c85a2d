"""Numerical parity: our JAX Whisper vs torch HF WhisperForConditionalGeneration.

No pretrained weights are available in this environment, so parity is checked
against a *randomly initialized* HF model (same math, random weights) — this
validates every architectural detail (conv stem, positions, pre-LN blocks,
attention scaling, gelu variant, tied unembedding) without network access.
Mirrors the reference's decoder-parity strategy (SURVEY.md §4: token-level
equality vs whisper.cpp).
"""

import numpy as np
import pytest

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig, get_config
from openhush_tpu.models.whisper.convert import (config_from_hf,
                                                 from_hf_state_dict,
                                                 load_npz, save_npz)

torch = pytest.importorskip("torch")
import transformers  # noqa: E402


# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

TEST_VOCAB = 1000


def _make_pair(seed=0):
    """Matching (HF torch model, our params, our config)."""
    hf_cfg = transformers.WhisperConfig(
        vocab_size=TEST_VOCAB, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf_model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(hf_model.state_dict(), cfg)
    return hf_model, params, cfg


@pytest.fixture(scope="module")
def pair():
    return _make_pair()


def test_config_from_hf_known_sizes():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=384,
        encoder_layers=4, encoder_attention_heads=6,
        decoder_layers=4, decoder_attention_heads=6,
        max_source_positions=1500, max_target_positions=448)
    assert config_from_hf(hf_cfg).name == "tiny"


def test_encoder_parity(pair):
    hf_model, params, cfg = pair
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        theirs = hf_model.model.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(whisper.encode(cfg, params, mel))
    assert ours.shape == theirs.shape == (2, 1500, 64)
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_full_forward_parity(pair):
    hf_model, params, cfg = pair
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    tokens = rng.integers(0, TEST_VOCAB, size=(1, 7)).astype(np.int32)
    with torch.no_grad():
        theirs = hf_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)),
        ).logits.numpy()
    ours = np.asarray(whisper.forward(cfg, params, mel, tokens))
    np.testing.assert_allclose(ours[:, :, :TEST_VOCAB], theirs, atol=3e-3)
    # Padded vocab region is masked out.
    assert (ours[:, :, TEST_VOCAB:] < -1e30).all()


def test_incremental_decode_matches_prefill(pair):
    """KV-cached step-by-step decode must equal a single teacher-forced pass —
    the property that makes continuous batching correct."""
    _, params, cfg = pair
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    tokens = rng.integers(0, TEST_VOCAB, size=(1, 6)).astype(np.int32)

    full = np.asarray(whisper.forward(cfg, params, mel, tokens))

    feats = whisper.encode(cfg, params, mel)
    xkv = whisper.compute_cross_kv(cfg, params, feats)
    cache = whisper.init_kv_cache(cfg, batch=1)
    import jax.numpy as jnp
    # Prefill first 3 tokens, then 3 single-token steps.
    logits_pre, cache = whisper.decode(cfg, params, tokens[:, :3],
                                       jnp.int32(0), cache, xkv)
    step_logits = [np.asarray(logits_pre)]
    for t in range(3, 6):
        lg, cache = whisper.decode(cfg, params, tokens[:, t:t + 1],
                                   jnp.int32(t), cache, xkv)
        step_logits.append(np.asarray(lg))
    stitched = np.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(stitched, full, atol=2e-3)


def test_batched_decode_independent(pair):
    """Each batch row decodes independently (no cross-batch leakage)."""
    _, params, cfg = pair
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32)
    tokens = rng.integers(0, TEST_VOCAB, size=(2, 5)).astype(np.int32)
    both = np.asarray(whisper.forward(cfg, params, mel, tokens))
    solo0 = np.asarray(whisper.forward(cfg, params, mel[:1], tokens[:1]))
    np.testing.assert_allclose(both[:1], solo0, atol=1e-4)


def test_npz_roundtrip(tmp_path, pair):
    _, params, cfg = pair
    p = str(tmp_path / "m.npz")
    save_npz(params, p)
    loaded = load_npz(p)
    import jax
    da = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    db = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    assert da.keys() == db.keys()
    for k in da:
        np.testing.assert_array_equal(np.asarray(da[k]), np.asarray(db[k]))


def test_init_params_shapes():
    import jax
    cfg = get_config("test")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0))
    assert params["decoder"]["tok_emb"].shape == (cfg.n_vocab_padded, 64)
    assert params["encoder"]["layers"]["q_w"].shape == (2, 64, 64)
    # Sinusoidal positions match OpenAI layout.
    pe = np.asarray(params["encoder"]["pos_emb"])
    assert pe.shape == (1500, 64)
    np.testing.assert_allclose(pe[0, :32], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(pe[0, 32:], 1.0, atol=1e-7)   # cos(0)


def test_quantized_cross_kv_matches_fp(pair):
    """int8 cross-KV must be argmax-identical and prob-close to fp."""
    import jax
    import jax.numpy as jnp
    _, params, cfg = pair
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    feats = whisper.encode(cfg, params, mel)
    xkv_f = whisper.compute_cross_kv(cfg, params, feats)
    xkv_q = whisper.compute_cross_kv_quant(cfg, params, feats)
    assert xkv_q.k.dtype == jnp.int8
    tokens = rng.integers(0, TEST_VOCAB, (1, 4)).astype(np.int32)
    cache = whisper.init_kv_cache(cfg, 1)
    lf, _ = whisper.decode(cfg, params, tokens, jnp.int32(0), cache, xkv_f)
    cache = whisper.init_kv_cache(cfg, 1)
    lq, _ = whisper.decode(cfg, params, tokens, jnp.int32(0), cache, xkv_q)
    pf = np.asarray(jax.nn.softmax(lf[..., :TEST_VOCAB], -1))
    pq = np.asarray(jax.nn.softmax(lq[..., :TEST_VOCAB], -1))
    assert np.abs(pf - pq).max() < 5e-3
    np.testing.assert_array_equal(pf.argmax(-1), pq.argmax(-1))


def test_int8_encoder_rung_drift_and_structure(pair):
    """W8A8 encoder rung (quantize_encoder_weights + the int8 block in
    encode): every layer matrix becomes {'q' int8, 's' fp32 per-out-
    channel}; conv stem / pos / LN stay dense; features stay close to
    bf16 (activation+weight quantization compounds through L layers, so
    the contract is feature-level drift bounds + the WER gate stage
    (tools/checkpoint_gate.py wer_int8_encoder), not logit equality)."""
    import jax
    import jax.numpy as jnp
    _, params, cfg = pair
    qp = whisper.quantize_encoder_weights(params)
    for name in ("q_w", "k_w", "v_w", "o_w", "fc1_w", "fc2_w"):
        w = qp["encoder"]["layers"][name]
        assert isinstance(w, dict) and w["q"].dtype == jnp.int8
        assert w["s"].shape == w["q"].shape[:1] + w["q"].shape[2:]
    assert not isinstance(qp["encoder"]["conv1_w"], dict)
    assert not isinstance(qp["decoder"]["layers"]["q_w"], dict)
    # Idempotent (engine may see pre-quantized injected params).
    qp2 = whisper.quantize_encoder_weights(qp)
    assert qp2["encoder"]["layers"]["q_w"]["q"] is \
        qp["encoder"]["layers"]["q_w"]["q"]

    rng = np.random.default_rng(11)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5
    f_bf = np.asarray(whisper.encode(cfg, params, mel), np.float32)
    f_i8 = np.asarray(whisper.encode(cfg, qp, mel), np.float32)
    cos = ((f_bf * f_i8).sum()
           / (np.linalg.norm(f_bf) * np.linalg.norm(f_i8)))
    assert cos > 0.995, f"encoder rung features diverged: cosine {cos}"
    assert np.abs(f_bf - f_i8).max() < 0.1 * np.abs(f_bf).max()


def test_flash_block_env_guard(monkeypatch):
    """OPENHUSH_FLASH_BLOCK=0 / junk must not crash the encoder trace
    (ADVICE r2: blk<=0 div-by-zero)."""
    from openhush_tpu.models.whisper.model import _flash_block

    for bad in ("0", "-4", "notanumber", ""):
        monkeypatch.setenv("OPENHUSH_FLASH_BLOCK", bad)
        blk = _flash_block(1536)
        assert 1536 % blk == 0 and blk >= 1
    monkeypatch.setenv("OPENHUSH_FLASH_BLOCK", "512")
    assert _flash_block(1536) == 512
    monkeypatch.setenv("OPENHUSH_FLASH_BLOCK", "1536")
    assert _flash_block(1536) == 1536
    assert _flash_block(1024) == 1024


def test_flat_multi_attention_matches_single_step():
    """The S·H-lane multi-query flat attention must reproduce the S=1
    flat decode path per query to reduction-order noise — the numerical
    contract behind speculative verify exactness — and agree with the
    per-head views formulation within fp32 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openhush_tpu.models.whisper import model as whisper

    rng = np.random.default_rng(0)
    B, T, H, D, S = 3, 96, 4, 16, 5
    HD = H * D
    pos = jnp.asarray([7, 20, 33], jnp.int32)
    q3 = jnp.asarray(rng.standard_normal((B, S, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)

    key_idx = jnp.arange(T)[None, :]
    q_idx = jnp.arange(S)[:, None]
    mask4 = (key_idx[None] <= (pos[:, None, None] + q_idx[None]))[:, None]

    multi = whisper._attend_decode_flat_multi(q3, k, v, mask4, H)
    # Per-query S=1 flat calls with the matching single-step mask.
    for s in range(S):
        m1 = key_idx <= (pos + s)[:, None]
        one = whisper._attend_decode_flat(q3[:, s], k, v, m1, H)
        np.testing.assert_allclose(np.asarray(multi[:, s]),
                                   np.asarray(one), atol=2e-5)
    views = whisper._attend_views(q3.reshape(B, S, H, D),
                                  k.reshape(B, T, H, D),
                                  v.reshape(B, T, H, D), mask4)
    np.testing.assert_allclose(np.asarray(multi),
                               np.asarray(views.reshape(B, S, HD)),
                               atol=5e-3)


def test_flat_multi_attention_quant_matches_single_step():
    """Quantized (int8 KV + scales) multi-query flat attention replicates
    the S=1 quant path — including its query quantization — per query."""
    import jax.numpy as jnp
    import numpy as np

    from openhush_tpu.models.whisper import model as whisper

    rng = np.random.default_rng(1)
    B, T, H, D, S = 2, 64, 2, 32, 4
    HD = H * D
    q3 = jnp.asarray(rng.standard_normal((B, S, HD)), jnp.float32)
    kf = rng.standard_normal((B, T, H, D)).astype(np.float32)
    vf = rng.standard_normal((B, T, H, D)).astype(np.float32)
    ks = np.abs(kf).max(-1) / 127.0 + 1e-9
    vs = np.abs(vf).max(-1) / 127.0 + 1e-9
    k8 = jnp.asarray(np.clip(np.round(kf / ks[..., None]), -127, 127)
                     .reshape(B, T, HD), jnp.int8)
    v8 = jnp.asarray(np.clip(np.round(vf / vs[..., None]), -127, 127)
                     .reshape(B, T, HD), jnp.int8)
    ksj, vsj = jnp.asarray(ks, jnp.float32), jnp.asarray(vs, jnp.float32)

    multi = whisper._attend_decode_flat_multi(q3, k8, v8, None, H,
                                              ks=ksj, vs=vsj)
    for s in range(S):
        one = whisper._attend_decode_flat(q3[:, s], k8, v8, None, H,
                                          ks=ksj, vs=vsj)
        np.testing.assert_allclose(np.asarray(multi[:, s]),
                                   np.asarray(one), atol=2e-5)
