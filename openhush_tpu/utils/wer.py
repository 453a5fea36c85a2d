"""Word-error-rate harness.

The north star gates on WER parity with whisper.cpp on LibriSpeech
test-clean (BASELINE.md). This module provides:
- `wer()` — Levenshtein word alignment (S/D/I counts), dependency-free;
- `normalize_text()` — a compact English normalizer (case, punctuation,
  common contractions/number words) in the spirit of whisper's
  EnglishTextNormalizer so WER reflects recognition, not formatting;
- `evaluate_librispeech()` — runs the engine over a LibriSpeech-layout
  directory (chapter dirs with .flac/.wav + .trans.txt) when a local copy
  exists; the CLI `openhush evaluate` drives it.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Iterable, Optional

_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "shan't": "shall not",
    "n't": " not", "'re": " are", "'ve": " have", "'ll": " will",
    "'m": " am", "'d": " would",
}


def normalize_text(text: str) -> str:
    t = text.lower()
    for k, v in _CONTRACTIONS.items():
        t = t.replace(k, v)
    t = re.sub(r"[^a-z0-9' ]+", " ", t)
    t = re.sub(r"\s+'", " ", t)
    t = re.sub(r"'\s+", " ", t)
    return " ".join(t.split())


@dataclasses.dataclass
class WerResult:
    wer: float
    substitutions: int
    deletions: int
    insertions: int
    n_ref_words: int

    @property
    def errors(self) -> int:
        return self.substitutions + self.deletions + self.insertions


def wer(reference: str, hypothesis: str,
        normalize: bool = True) -> WerResult:
    """Word error rate via Levenshtein alignment with backtrace counts."""
    if normalize:
        reference = normalize_text(reference)
        hypothesis = normalize_text(hypothesis)
    ref = reference.split()
    hyp = hypothesis.split()
    R, H = len(ref), len(hyp)
    if R == 0:
        return WerResult(float(H > 0), 0, 0, H, 0)
    # DP over (R+1)x(H+1); track op counts to report S/D/I.
    INF = 1 << 30
    prev = [(j, 0, 0, j) for j in range(H + 1)]  # (cost, S, D, I)
    for i in range(1, R + 1):
        cur = [(i, 0, i, 0)] + [(INF, 0, 0, 0)] * H
        for j in range(1, H + 1):
            if ref[i - 1] == hyp[j - 1]:
                cand = [(prev[j - 1][0], *prev[j - 1][1:])]
            else:
                cand = [(prev[j - 1][0] + 1, prev[j - 1][1] + 1,
                         prev[j - 1][2], prev[j - 1][3])]
            cand.append((prev[j][0] + 1, prev[j][1], prev[j][2] + 1,
                         prev[j][3]))                       # deletion
            cand.append((cur[j - 1][0] + 1, cur[j - 1][1], cur[j - 1][2],
                         cur[j - 1][3] + 1))                # insertion
            cur[j] = min(cand)
        prev = cur
    cost, s, d, ins = prev[H]
    return WerResult(cost / R, s, d, ins, R)


def aggregate(results: Iterable[WerResult]) -> WerResult:
    s = d = i = n = 0
    for r in results:
        s += r.substitutions
        d += r.deletions
        i += r.insertions
        n += r.n_ref_words
    return WerResult((s + d + i) / max(n, 1), s, d, i, n)


# ---------------------------------------------------------------------------
# LibriSpeech evaluation
# ---------------------------------------------------------------------------

def iter_librispeech(root: str):
    """Yield (audio_path, reference_text) from a LibriSpeech-layout tree."""
    for dirpath, _, files in os.walk(root):
        trans = [f for f in files if f.endswith(".trans.txt")]
        for tf in trans:
            with open(os.path.join(dirpath, tf)) as f:
                for line in f:
                    utt, _, text = line.strip().partition(" ")
                    for ext in (".flac", ".wav"):
                        p = os.path.join(dirpath, utt + ext)
                        if os.path.exists(p):
                            yield p, text
                            break


def evaluate_librispeech(engine, root: str, limit: Optional[int] = None,
                         progress: bool = True) -> WerResult:
    """Transcribe a LibriSpeech split and return aggregate WER.

    .flac inputs need soundfile/ffmpeg; .wav copies work out of the box."""
    from openhush_tpu.audio.wav import load_wav
    results = []
    for n, (path, ref) in enumerate(iter_librispeech(root)):
        if limit and n >= limit:
            break
        if path.endswith(".flac"):
            audio = _load_flac(path)
            if audio is None:
                continue
        else:
            audio = load_wav(path)
        hyp = engine.transcribe(audio, language="en").text
        r = wer(ref, hyp)
        results.append(r)
        if progress and n % 20 == 0:
            agg = aggregate(results)
            print(f"[{n}] running WER: {agg.wer:.4f}")
    return aggregate(results)


def _load_flac(path: str):
    try:
        import soundfile as sf  # type: ignore
        data, rate = sf.read(path, dtype="float32")
        from openhush_tpu.ops.resample import resample
        if data.ndim > 1:
            data = data.mean(axis=1)
        if rate != 16000:
            data = resample(data, rate, 16000)
        return data
    except ImportError:
        import shutil
        import subprocess
        import tempfile
        if not shutil.which("ffmpeg"):
            return None
        with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
            subprocess.run(["ffmpeg", "-y", "-i", path, "-ar", "16000",
                            "-ac", "1", tmp.name], capture_output=True)
            from openhush_tpu.audio.wav import load_wav
            return load_wav(tmp.name)
