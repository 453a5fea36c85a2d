#!/usr/bin/env bash
# One-shot: fetch all published checkpoints, convert, and run every
# validation gate (docs/RUNBOOK.md §7). Requires network + git-lfs.
set -euo pipefail

WORK="${WORK:-/tmp/openhush-checkpoints}"
MODEL="${MODEL:-large-v3}"
mkdir -p "$WORK"

echo "== 1. Whisper $MODEL =="
[ -d "$WORK/whisper" ] || git clone --depth 1 \
    "https://huggingface.co/openai/whisper-$MODEL" "$WORK/whisper"
openhush model convert "$MODEL" --hf-path "$WORK/whisper"
python tools/parity_gate.py "$MODEL" --hf-path "$WORK/whisper" \
    --wavs tests/data/*.wav

echo "== 2. M2M-100 =="
[ -d "$WORK/m2m" ] || git clone --depth 1 \
    "https://huggingface.co/facebook/m2m100_418M" "$WORK/m2m"
openhush model convert-m2m100 418M --hf-path "$WORK/m2m"

echo "== 3. Silero VAD =="
AUX="$HOME/.local/share/openhush/models/aux"
[ -f "$WORK/silero_vad.jit" ] || curl -fL -o "$WORK/silero_vad.jit" \
    "https://github.com/snakers4/silero-vad/raw/master/src/silero_vad/data/silero_vad.jit"
openhush model convert-aux silero "$WORK/silero_vad.jit"
python tools/validate_aux.py silero "$WORK/silero_vad.jit" "$AUX/silero.npz"

echo "== 4. openWakeWord =="
BASE="https://github.com/dscripka/openWakeWord/releases/download"
[ -f "$WORK/embedding_model.onnx" ] || curl -fL -o "$WORK/embedding_model.onnx" \
    "$BASE/v0.5.1/embedding_model.onnx"
[ -f "$WORK/hey_jarvis.onnx" ] || curl -fL -o "$WORK/hey_jarvis.onnx" \
    "$BASE/v0.5.1/hey_jarvis_v0.1.onnx"
openhush model convert-aux wakeword-embedding "$WORK/embedding_model.onnx"
openhush model convert-aux wakeword-classifier "$WORK/hey_jarvis.onnx"
python tools/validate_aux.py onnx "$AUX/wakeword_embedding.onnx"
python tools/validate_aux.py onnx "$AUX/wakeword_classifier.onnx"

echo "== 5. Diarization (wespeaker + pyannote segmentation) =="
[ -f "$WORK/wespeaker.onnx" ] || curl -fL -o "$WORK/wespeaker.onnx" \
    "https://huggingface.co/pyannote/wespeaker-voxceleb-resnet34-LM/resolve/main/speaker-embedding.onnx"
openhush model convert-aux wespeaker "$WORK/wespeaker.onnx"
python tools/validate_aux.py onnx "$AUX/wespeaker.onnx"

echo "== 6. RNNoise =="
[ -f "$WORK/rnnoise.rnnn" ] || curl -fL -o "$WORK/rnnoise.rnnn" \
    "https://raw.githubusercontent.com/GregorR/rnnoise-models/master/somnolent-hogwash-2018-09-01/sh.rnnn"
openhush model convert-aux rnnoise "$WORK/rnnoise.rnnn"
python tools/validate_aux.py rnnoise "$WORK/rnnoise.rnnn" "$AUX/rnnoise.npz"

echo "ALL GATES PASSED"
