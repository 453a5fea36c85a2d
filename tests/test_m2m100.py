"""M2M-100 JAX seq2seq: parity vs randomly-initialized torch HF model,
greedy loop behavior, language table."""

import numpy as np
import pytest

from openhush_tpu.models import m2m100

torch = pytest.importorskip("torch")
import transformers  # noqa: E402



# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.M2M100Config(
        vocab_size=1000, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128, max_position_embeddings=64,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, scale_embedding=True)
    torch.manual_seed(0)
    hf = transformers.M2M100ForConditionalGeneration(hf_cfg).eval()
    cfg = m2m100.M2MConfig(name="paritytest", vocab_size=1000, d_model=64,
                           n_heads=2, n_enc_layers=2, n_dec_layers=2,
                           ffn_dim=128, max_positions=64,
                           lang_token_base=900)
    params = m2m100.from_hf_state_dict(hf.state_dict(), cfg)
    return hf, params, cfg


def test_encoder_parity(pair):
    hf, params, cfg = pair
    rng = np.random.default_rng(0)
    tokens = rng.integers(3, 900, (2, 10)).astype(np.int64)
    tokens[1, 7:] = m2m100.PAD        # padded row
    with torch.no_grad():
        theirs = hf.model.encoder(
            torch.from_numpy(tokens),
            attention_mask=torch.from_numpy(
                (tokens != m2m100.PAD).astype(np.int64)),
        ).last_hidden_state.numpy()
    ours = np.asarray(m2m100.encode(cfg, params,
                                    tokens.astype(np.int32)))
    # Compare non-pad positions (pad rows differ only where masked out).
    mask = tokens != m2m100.PAD
    np.testing.assert_allclose(ours[mask], theirs[mask], atol=3e-4)


def test_full_forward_parity(pair):
    hf, params, cfg = pair
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    src = rng.integers(3, 900, (1, 8)).astype(np.int64)
    dec_in = rng.integers(3, 900, (1, 5)).astype(np.int64)
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(src),
                    decoder_input_ids=torch.from_numpy(dec_in)
                    ).logits.numpy()
    feats = m2m100.encode(cfg, params, src.astype(np.int32))
    xkv = m2m100.compute_cross_kv(cfg, params, feats)
    cache = m2m100.init_kv_cache(cfg, 1, max_len=8)
    ours, _ = m2m100.decode(cfg, params, jnp.asarray(dec_in, jnp.int32),
                            jnp.int32(0), cache, xkv,
                            jnp.asarray(src, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours)[:, :, :1000], theirs,
                               atol=3e-3)


def test_greedy_translate_runs(pair):
    _, params, cfg = pair
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    src = rng.integers(3, 900, (2, 6)).astype(np.int32)
    out = np.asarray(m2m100.greedy_translate(
        cfg, params, jnp.asarray(src), jnp.int32(905), max_new=16))
    assert out.shape == (2, 16)
    assert ((out >= 0) & (out < cfg.vocab_size)).all()


def test_lang_token_table():
    cfg = m2m100.CONFIGS["418M"]
    assert m2m100.lang_token_id(cfg, "af") == 128004
    assert m2m100.lang_token_id(cfg, "de") == \
        128004 + m2m100.LANG_CODES.index("de")
    assert len(m2m100.LANG_CODES) == 100
    with pytest.raises(ValueError, match="unknown M2M-100 language"):
        m2m100.lang_token_id(cfg, "xx")


def test_sinusoidal_positions_layout():
    pe = m2m100.sinusoidal_positions(10, 8)
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(pe[m2m100.PAD], 0.0)   # padding row zeroed
    np.testing.assert_allclose(pe[0, :4], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 4:], 1.0, atol=1e-7)  # cos(0)
