"""Convert Hugging Face Whisper checkpoints → openhush-tpu param pytrees.

Replaces the reference's GGML model files (ggml-*.bin downloads,
src/engine/whisper.rs:427-435,456-598) with HF `WhisperForConditionalGeneration`
state dicts (torch .bin / .safetensors), converted once into our stacked-layer
layout and stored as orbax/npz for fast TPU loads.

Layout transforms:
- torch Linear [out, in]  →  ours [in, out]  (transpose)
- torch Conv1d [out, in, k] → ours [k, in, out] ('HIO')
- per-layer tensors are stacked along a new leading [n_layer] axis
- embed_tokens is zero-padded from n_vocab to n_vocab_padded (MXU tiling)
"""

from __future__ import annotations

import numpy as np

from openhush_tpu.models.whisper.config import WhisperConfig, CONFIGS


def config_from_hf(hf_config) -> WhisperConfig:
    """Derive our config from a transformers WhisperConfig."""
    for cfg in CONFIGS.values():
        if (cfg.n_audio_state == hf_config.d_model
                and cfg.n_audio_layer == hf_config.encoder_layers
                and cfg.n_text_layer == hf_config.decoder_layers
                and cfg.n_mels == hf_config.num_mel_bins
                and cfg.n_vocab == hf_config.vocab_size):
            return cfg
    n_langs = 100 if hf_config.vocab_size >= 51866 else 99
    return WhisperConfig(
        name="custom", n_mels=hf_config.num_mel_bins,
        n_audio_ctx=hf_config.max_source_positions,
        n_audio_state=hf_config.d_model,
        n_audio_head=hf_config.encoder_attention_heads,
        n_audio_layer=hf_config.encoder_layers,
        n_vocab=hf_config.vocab_size,
        n_text_ctx=hf_config.max_target_positions,
        n_text_state=hf_config.d_model,
        n_text_head=hf_config.decoder_attention_heads,
        n_text_layer=hf_config.decoder_layers,
        n_langs=n_langs,
    )


def _np(t):
    """torch tensor / numpy array → float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _stack(sd, n_layers, template, transpose=False):
    """Stack `template.format(i)` across layers; optionally transpose 2-D."""
    mats = []
    for i in range(n_layers):
        m = _np(sd[template.format(i)])
        if transpose:
            m = m.T
        mats.append(m)
    return np.stack(mats)


def from_hf_state_dict(sd: dict, cfg: WhisperConfig, dtype=np.float32) -> dict:
    """HF WhisperForConditionalGeneration state dict → our param pytree
    (numpy arrays; caller device_puts / shards them)."""
    # Accept both "model.encoder..." (ForConditionalGeneration) and
    # "encoder..." (bare WhisperModel) key prefixes.
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    def enc_layers():
        L, pre = cfg.n_audio_layer, "encoder.layers.{}."
        t = lambda s, tr=True: _stack(sd, L, pre + s, transpose=tr)
        return {
            "ln1_scale": t("self_attn_layer_norm.weight", False),
            "ln1_bias": t("self_attn_layer_norm.bias", False),
            "q_w": t("self_attn.q_proj.weight"), "q_b": t("self_attn.q_proj.bias", False),
            "k_w": t("self_attn.k_proj.weight"),
            "v_w": t("self_attn.v_proj.weight"), "v_b": t("self_attn.v_proj.bias", False),
            "o_w": t("self_attn.out_proj.weight"), "o_b": t("self_attn.out_proj.bias", False),
            "ln2_scale": t("final_layer_norm.weight", False),
            "ln2_bias": t("final_layer_norm.bias", False),
            "fc1_w": t("fc1.weight"), "fc1_b": t("fc1.bias", False),
            "fc2_w": t("fc2.weight"), "fc2_b": t("fc2.bias", False),
        }

    def dec_layers():
        L, pre = cfg.n_text_layer, "decoder.layers.{}."
        t = lambda s, tr=True: _stack(sd, L, pre + s, transpose=tr)
        return {
            "ln1_scale": t("self_attn_layer_norm.weight", False),
            "ln1_bias": t("self_attn_layer_norm.bias", False),
            "q_w": t("self_attn.q_proj.weight"), "q_b": t("self_attn.q_proj.bias", False),
            "k_w": t("self_attn.k_proj.weight"),
            "v_w": t("self_attn.v_proj.weight"), "v_b": t("self_attn.v_proj.bias", False),
            "o_w": t("self_attn.out_proj.weight"), "o_b": t("self_attn.out_proj.bias", False),
            "ln2_scale": t("encoder_attn_layer_norm.weight", False),
            "ln2_bias": t("encoder_attn_layer_norm.bias", False),
            "xq_w": t("encoder_attn.q_proj.weight"), "xq_b": t("encoder_attn.q_proj.bias", False),
            "xk_w": t("encoder_attn.k_proj.weight"),
            "xv_w": t("encoder_attn.v_proj.weight"), "xv_b": t("encoder_attn.v_proj.bias", False),
            "xo_w": t("encoder_attn.out_proj.weight"), "xo_b": t("encoder_attn.out_proj.bias", False),
            "ln3_scale": t("final_layer_norm.weight", False),
            "ln3_bias": t("final_layer_norm.bias", False),
            "fc1_w": t("fc1.weight"), "fc1_b": t("fc1.bias", False),
            "fc2_w": t("fc2.weight"), "fc2_b": t("fc2.bias", False),
        }

    tok = _np(sd["decoder.embed_tokens.weight"])
    if tok.shape[0] < cfg.n_vocab_padded:
        tok = np.concatenate(
            [tok, np.zeros((cfg.n_vocab_padded - tok.shape[0], tok.shape[1]),
                           tok.dtype)])

    params = {
        "encoder": {
            "conv1_w": _np(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
            "conv1_b": _np(sd["encoder.conv1.bias"]),
            "conv2_w": _np(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
            "conv2_b": _np(sd["encoder.conv2.bias"]),
            "pos_emb": _np(sd["encoder.embed_positions.weight"]),
            "layers": enc_layers(),
            "ln_post_scale": _np(sd["encoder.layer_norm.weight"]),
            "ln_post_bias": _np(sd["encoder.layer_norm.bias"]),
        },
        "decoder": {
            "tok_emb": tok,
            "pos_emb": _np(sd["decoder.embed_positions.weight"]),
            "layers": dec_layers(),
            "ln_scale": _np(sd["decoder.layer_norm.weight"]),
            "ln_bias": _np(sd["decoder.layer_norm.bias"]),
        },
    }
    if dtype != np.float32:
        import jax.numpy as jnp
        import jax
        params = jax.tree.map(lambda a: a.astype(dtype), params)
    return params


def save_npz(params: dict, path: str) -> None:
    """Flatten the pytree into a .npz (fast, dependency-free checkpoint)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    flat = np.load(path)
    params: dict = {}
    for key in flat.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return params
