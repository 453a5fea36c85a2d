#!/usr/bin/env bash
# Day-one networked-machine path: fetch every published checkpoint, then
# hand off to the SINGLE gate (tools/checkpoint_gate.py) which converts,
# validates, measures WER (bf16 + int8-self-cache serving rung), decides
# the int8 default flip, and writes gate_report.json.
#
#   WORK=/tmp/openhush-checkpoints DATASET=/data/LibriSpeech/test-clean \
#       tools/fetch_and_validate_all.sh
#
# Every stage below the fetches has an offline dry-run exercised in CI
# (tests/test_checkpoint_gate.py), so this script's only untested part is
# the downloads themselves. Requires network + git-lfs.
set -euo pipefail

WORK="${WORK:-/tmp/openhush-checkpoints}"
MODEL="${MODEL:-large-v3}"
DATASET="${DATASET:-}"
LIMIT="${LIMIT:-}"
mkdir -p "$WORK"

echo "== fetch: Whisper $MODEL =="
[ -d "$WORK/whisper" ] || git clone --depth 1 \
    "https://huggingface.co/openai/whisper-$MODEL" "$WORK/whisper"

echo "== fetch: M2M-100 =="
[ -d "$WORK/m2m" ] || git clone --depth 1 \
    "https://huggingface.co/facebook/m2m100_418M" "$WORK/m2m"

echo "== fetch: Silero VAD =="
[ -f "$WORK/silero_vad.jit" ] || curl -fL -o "$WORK/silero_vad.jit" \
    "https://github.com/snakers4/silero-vad/raw/master/src/silero_vad/data/silero_vad.jit"

echo "== fetch: openWakeWord =="
BASE="https://github.com/dscripka/openWakeWord/releases/download"
[ -f "$WORK/embedding_model.onnx" ] || curl -fL -o "$WORK/embedding_model.onnx" \
    "$BASE/v0.5.1/embedding_model.onnx"
[ -f "$WORK/hey_jarvis.onnx" ] || curl -fL -o "$WORK/hey_jarvis.onnx" \
    "$BASE/v0.5.1/hey_jarvis_v0.1.onnx"

echo "== fetch: wespeaker =="
[ -f "$WORK/wespeaker.onnx" ] || curl -fL -o "$WORK/wespeaker.onnx" \
    "https://huggingface.co/pyannote/wespeaker-voxceleb-resnet34-LM/resolve/main/speaker-embedding.onnx"

echo "== fetch: RNNoise =="
[ -f "$WORK/rnnoise.rnnn" ] || curl -fL -o "$WORK/rnnoise.rnnn" \
    "https://raw.githubusercontent.com/GregorR/rnnoise-models/master/somnolent-hogwash-2018-09-01/sh.rnnn"

if [ -z "$DATASET" ] && [ ! -d "$WORK/LibriSpeech/test-clean" ]; then
    echo "== fetch: LibriSpeech test-clean =="
    curl -fL -o "$WORK/test-clean.tar.gz" \
        "https://www.openslr.org/resources/12/test-clean.tar.gz"
    tar -xzf "$WORK/test-clean.tar.gz" -C "$WORK"
    DATASET="$WORK/LibriSpeech/test-clean"
fi

echo "== gate =="
python "$(dirname "$0")/checkpoint_gate.py" \
    --model "$MODEL" --work "$WORK" \
    ${DATASET:+--dataset "$DATASET"} ${LIMIT:+--limit "$LIMIT"}
