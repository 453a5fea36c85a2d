"""Draft distillation (training/distill.py): the machinery that turns
the bench's interpolated spec numbers into measured ones (VERDICT r4 #5).

The tiny teacher/draft pair mirrors the large-v3 : large-v3-turbo
relationship (same width + vocab, shallow decoder — config.py registry).
No reference counterpart: whisper.cpp decodes strictly sequentially
(src/engine/whisper.rs:204-305)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import get_config
from openhush_tpu.text.tokenizer import WhisperTokenizer
from openhush_tpu.training import distill

B = 4
GEN = 16


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("test")
    dcfg = get_config("test-draft")
    params = whisper.init_params(cfg, jax.random.PRNGKey(0),
                                 dtype=jnp.float32)
    tok = WhisperTokenizer(cfg.n_langs)
    sup = decoding.build_suppress_mask(
        tok, cfg, decoding.DecodingOptions(without_timestamps=True)).copy()
    sup[tok.special.eot] = True        # run to the token budget (as bench)
    prompt = np.tile(np.asarray(
        tok.sot_sequence("en", "transcribe", timestamps=False), np.int32),
        (B, 1))
    return cfg, dcfg, params, sup, prompt


def _mel_fn(cfg):
    def fn(rng):
        return (0.1 * rng.standard_normal(
            (B, cfg.n_mels, 3000))).astype(np.float32)
    return fn


def test_rollout_deterministic_and_suppressed(setup):
    cfg, _, params, sup, prompt = setup
    rng = np.random.default_rng(3)
    mel = jnp.asarray(_mel_fn(cfg)(rng))
    sup_j = jnp.asarray(sup)
    f1, t1 = distill.teacher_rollout(cfg, params, mel, jnp.asarray(prompt),
                                     sup_j, prompt_len=prompt.shape[1],
                                     gen_tokens=GEN)
    f2, t2 = distill.teacher_rollout(cfg, params, mel, jnp.asarray(prompt),
                                     sup_j, prompt_len=prompt.shape[1],
                                     gen_tokens=GEN)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    assert t1.shape == (B, prompt.shape[1] + GEN)
    np.testing.assert_array_equal(t1, t2)
    # Prompt is echoed verbatim; generated ids never hit suppressed ones.
    np.testing.assert_array_equal(t1[:, :prompt.shape[1]], prompt)
    gen = t1[:, prompt.shape[1]:]
    assert not sup[gen.ravel()].any()
    assert f1.shape == (B, cfg.n_audio_ctx, cfg.n_audio_state)


@pytest.mark.slow
def test_distill_improves_heldout_agreement(setup):
    cfg, dcfg, params, sup, prompt = setup
    dp, stats = distill.distill_draft(
        cfg, params, dcfg, _mel_fn(cfg), prompt, sup,
        n_batches=3, epochs=10, gen_tokens=GEN, lr=1e-3, seed=11)
    # A random draft agrees with the teacher ~never (init ~0); training
    # on the teacher's own trajectories must buy real agreement.
    assert stats["heldout_agree"] >= max(0.10,
                                         stats["init_heldout_agree"] + 0.08)
    assert stats["heldout_ce"] < 0.7 * stats["init_heldout_ce"]
    # The returned pytree is serve-ready: init_params-shaped, bf16, and
    # structurally identical to what EngineServer(draft=...) expects.
    ref = whisper.init_params(dcfg, jax.random.PRNGKey(1),
                              dtype=jnp.bfloat16)
    assert (jax.tree_util.tree_structure(dp)
            == jax.tree_util.tree_structure(ref))
    assert dp["decoder"]["tok_emb"].dtype == jnp.bfloat16
    # ... and actually runs through the draft-side ops the server uses.
    feats = jnp.zeros((1, cfg.n_audio_ctx, cfg.n_audio_state),
                      jnp.bfloat16)
    whisper.compute_cross_kv_quant(dcfg, dp, feats)


def test_distill_time_budget_degrades_gracefully(setup):
    cfg, dcfg, params, sup, prompt = setup
    dp, stats = distill.distill_draft(
        cfg, params, dcfg, _mel_fn(cfg), prompt, sup,
        n_batches=6, epochs=50, gen_tokens=GEN, time_budget_s=0.0,
        seed=5)
    # Budget 0: at least one rollout + held-out + one epoch still happen,
    # and the result is still a complete, typed draft pytree.
    assert stats["rollout_batches"] >= 1
    assert stats["steps"] >= 1
    assert dp["decoder"]["tok_emb"].dtype == jnp.bfloat16
