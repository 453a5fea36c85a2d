"""Full generate-loop token exactness vs an independent torch reference.

The torch side runs the HF WhisperForConditionalGeneration forward with
its own KV cache (past_key_values) in a hand-rolled greedy loop, with the
openai-whisper filter transcription (tests/openai_filters.py) and the
same static suppression set. Our side runs the production path:
encode → cross-KV → decode_greedy (one compiled lax.while_loop with
vectorized filters). Token-exact agreement over full trajectories covers
the entire decode loop offline — prompt construction, cache indexing,
filter application order, EOT stop — so a converted real checkpoint only
has to get tensor mapping right (gate: tools/parity_gate.py on a
networked machine; see docs/RUNBOOK.md §1).

Uses the real Whisper special-token layout (vocab 51865, eot 50257) with
a tiny d_model so the whole thing runs in seconds on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.convert import (config_from_hf,
                                                 from_hf_state_dict)
from openhush_tpu.text.tokenizer import WhisperTokenizer
from tests.openai_filters import openai_apply

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

NEG = decoding.NEG_INF


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=50257, bos_token_id=50257, eos_token_id=50257,
        decoder_start_token_id=50258, suppress_tokens=None,
        begin_suppress_tokens=None)
    torch.manual_seed(11)
    hf_model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(hf_model.state_dict(), cfg)
    tok = WhisperTokenizer(cfg.n_langs)
    rng = np.random.default_rng(3)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.4
    return hf_model, cfg, params, tok, mel


def _torch_greedy(hf_model, tok, mel, prompt, *, max_new,
                  use_timestamps, suppress_mask, blank, max_initial_index):
    """Independent reference loop: HF forward + openai filter transcription."""
    sp = tok.special
    with torch.no_grad():
        enc = hf_model.model.encoder(torch.from_numpy(mel))
    ids = torch.tensor([prompt], dtype=torch.long)
    past = None
    seq: list[int] = []
    # our mask covers the TPU-padded vocab; torch logits are unpadded
    static_idx = np.nonzero(suppress_mask)[0]
    static_idx = static_idx[static_idx < hf_model.config.vocab_size]
    feed = ids
    for _ in range(max_new):
        with torch.no_grad():
            out = hf_model(decoder_input_ids=feed,
                           encoder_outputs=(enc.last_hidden_state,),
                           past_key_values=past, use_cache=True)
        past = out.past_key_values
        logits = out.logits[:, -1].float().numpy()
        logits[:, static_idx] = NEG
        if not use_timestamps and len(seq) == 0:
            logits[0, blank] = NEG
            logits[0, sp.eot] = NEG
        if use_timestamps:
            logits = openai_apply(
                logits, [seq], eot=sp.eot, no_ts=sp.no_timestamps,
                ts_begin=sp.timestamp_begin, blank=blank,
                max_initial_index=max_initial_index, suppress_blank=True)
        nxt = int(np.argmax(logits[0]))
        if nxt == sp.eot:
            break
        seq.append(nxt)
        feed = torch.tensor([[nxt]], dtype=torch.long)
    return seq


def _ours_greedy(cfg, params, tok, mel, *, without_timestamps, max_new):
    feats = whisper.encode(cfg, params, jnp.asarray(mel))
    xkv = whisper.compute_cross_kv(cfg, params, feats)
    opts = decoding.DecodingOptions(without_timestamps=without_timestamps,
                                    max_new_tokens=max_new)
    res = decoding.decode_greedy(cfg, params, xkv, tok, opts,
                                 languages=["en"])
    sp = tok.special
    row = res.tokens[0, res.prompt_len:]
    out = []
    for t in row:
        if t == sp.eot:
            break
        out.append(int(t))
    return out, res.prompt_len


@pytest.mark.parametrize("use_timestamps", [False, True])
def test_generate_token_exact(pair, use_timestamps):
    hf_model, cfg, params, tok, mel = pair
    sp = tok.special
    opts = decoding.DecodingOptions(without_timestamps=not use_timestamps)
    suppress = decoding.build_suppress_mask(tok, cfg, opts)
    blank = tok.encode(" ")
    blank = blank[0] if blank else 220
    prompt = tok.sot_sequence("en", "transcribe",
                              timestamps=use_timestamps)
    max_new = 40

    ref = _torch_greedy(hf_model, tok, mel, prompt, max_new=max_new,
                        use_timestamps=use_timestamps,
                        suppress_mask=suppress, blank=blank,
                        max_initial_index=50)
    ours, _ = _ours_greedy(cfg, params, tok, mel,
                           without_timestamps=not use_timestamps,
                           max_new=max_new)
    assert ours == ref, (f"token divergence\n ours={ours}\n  ref={ref}")
    assert len(ref) > 3   # trajectory long enough to mean something


def test_generate_deterministic(pair):
    hf_model, cfg, params, tok, mel = pair
    a, _ = _ours_greedy(cfg, params, tok, mel, without_timestamps=False,
                        max_new=24)
    b, _ = _ours_greedy(cfg, params, tok, mel, without_timestamps=False,
                        max_new=24)
    assert a == b
