"""openhush-tpu: a TPU-native rebuild of OpenHush's voice-to-text stack.

The reference (claymore666/openhush) is a Rust desktop dictation app embedding
whisper.cpp; this package replaces that engine with a JAX/XLA/Pallas stack:

- ``openhush_tpu.ops``      — audio frontend (resample, RNNoise, STFT, log-mel,
                              DSP chain) as jittable JAX ops + fused Pallas kernels
- ``openhush_tpu.models``   — Whisper encoder/decoder, VAD, wake word, diarization
                              as pure-functional JAX models
- ``openhush_tpu.runtime``  — engine, continuous batcher, ring buffer, tracker
- ``openhush_tpu.parallel`` — device mesh + sharding rules (tp/dp over ICI)
- ``openhush_tpu.text``     — tokenizer, output formats (text/json/srt/vtt)
- ``openhush_tpu.audio``    — WAV I/O and host capture
- ``openhush_tpu.api``      — REST control plane
- ``openhush_tpu.training`` — fine-tuning step (sharded)

Reference parity map lives in SURVEY.md §2; citations into /root/reference are
given per-module in docstrings.
"""

__version__ = "0.1.0"
