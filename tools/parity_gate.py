#!/usr/bin/env python3
"""Parity gate: converted Whisper npz vs the HF source checkpoint.

Run on a networked machine after `openhush model convert` (docs/RUNBOOK.md
§1). For each WAV it greedy-decodes with (a) our engine on the converted
npz and (b) a torch reference loop on the HF checkpoint with the
openai-whisper filter transcription, and fails on any token difference.
The offline twin of this gate — same loops on random weights — is
tests/test_generate_parity.py; this tool adds only real weights and real
audio.

Usage:
  python tools/parity_gate.py large-v3 --hf-path /tmp/hf-large-v3 \
      --wavs a.wav b.wav [--timestamps]
"""

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--hf-path", required=True)
    ap.add_argument("--npz", default=None,
                    help="converted npz (default: model dir)")
    ap.add_argument("--wavs", nargs="+", required=True)
    ap.add_argument("--timestamps", action="store_true")
    ap.add_argument("--max-new", type=int, default=128)
    args = ap.parse_args()

    import torch
    import transformers

    import jax.numpy as jnp
    from openhush_tpu.audio.wav import load_wav
    from openhush_tpu.models.whisper import decoding, model as whisper
    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.models.whisper.convert import load_npz
    from openhush_tpu.ops.mel import log_mel_spectrogram
    from openhush_tpu.runtime.engine import default_model_dir
    from openhush_tpu.text.tokenizer import WhisperTokenizer

    # tests/ holds the reference torch loop; reuse it verbatim.
    sys.path.insert(0, ".")
    from tests.test_generate_parity import _torch_greedy

    cfg = get_config(args.name)
    npz = args.npz or f"{default_model_dir()}/{args.name}.npz"
    params = load_npz(npz)
    tok = WhisperTokenizer(cfg.n_langs)
    hf = transformers.WhisperForConditionalGeneration.from_pretrained(
        args.hf_path).eval()

    opts = decoding.DecodingOptions(
        without_timestamps=not args.timestamps,
        max_new_tokens=args.max_new)
    suppress = decoding.build_suppress_mask(tok, cfg, opts)
    blank = tok.encode(" ")[0]
    prompt = tok.sot_sequence("en", "transcribe",
                              timestamps=args.timestamps)

    failures = 0
    for wav in args.wavs:
        audio = load_wav(wav)
        n = 30 * 16000
        a = np.zeros(n, np.float32)
        a[:min(len(audio), n)] = audio[:n]
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(a), n_mels=cfg.n_mels))[None]

        feats = whisper.encode(cfg, params, jnp.asarray(mel))
        xkv = whisper.compute_cross_kv(cfg, params, feats)
        res = decoding.decode_greedy(cfg, params, xkv, tok, opts,
                                     languages=["en"])
        ours = []
        for t in res.tokens[0, res.prompt_len:]:
            if t == tok.special.eot:
                break
            ours.append(int(t))

        ref = _torch_greedy(hf, tok, mel, prompt,
                            max_new=args.max_new,
                            use_timestamps=args.timestamps,
                            suppress_mask=suppress, blank=blank,
                            max_initial_index=50)
        ok = ours == ref
        print(f"{wav}: {'OK' if ok else 'TOKEN MISMATCH'} "
              f"({len(ours)} tokens)")
        if not ok:
            print(f"  ours: {ours}\n  ref:  {ref}")
            failures += 1
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} "
          f"({len(args.wavs) - failures}/{len(args.wavs)})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
