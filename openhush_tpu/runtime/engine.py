"""WhisperEngine: model lifecycle + long-form transcription.

TPU-native replacement for the reference engine wrapper
(src/engine/whisper.rs:110-382): loads a converted checkpoint (npz pytree)
instead of a GGML blob, keeps compiled encode/decode programs warm (the
analogue of whisper.cpp's pre-allocated WhisperState GPU buffers), and runs
the 30 s-window seek loop with temperature fallback, previous-text
conditioning, timestamp segmentation, language detection, and the translate
flag — behavior modeled on whisper.cpp's `full` pipeline that the reference
drives at src/engine/whisper.rs:204-305.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
import zlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig, get_config
from openhush_tpu.models.whisper.convert import load_npz
from openhush_tpu.ops import mel as mel_ops
from openhush_tpu.runtime import validation
from openhush_tpu.text.tokenizer import WhisperTokenizer

log = logging.getLogger(__name__)

# Temperature fallback schedule + acceptance thresholds (whisper defaults,
# the same heuristics whisper.cpp replicates). OPENHUSH_NO_FALLBACK=1
# disables the ladder (tests / latency-critical streaming).
TEMPERATURES = ((0.0,) if os.environ.get("OPENHUSH_NO_FALLBACK") == "1"
                else (0.0, 0.2, 0.4, 0.6, 0.8, 1.0))
COMPRESSION_RATIO_THRESHOLD = 2.4
LOGPROB_THRESHOLD = -1.0
NO_SPEECH_THRESHOLD = 0.6

FRAMES_PER_SECOND = 100          # mel frames / s (hop 160 @ 16 kHz)
INPUT_STRIDE = 2                 # mel frames per encoder position
TIME_PRECISION = 0.02            # seconds per timestamp token


@dataclasses.dataclass
class Segment:
    id: int
    start: float
    end: float
    text: str
    tokens: list[int]
    avg_logprob: float
    no_speech_prob: float
    compression_ratio: float
    temperature: float


@dataclasses.dataclass
class TranscriptionResult:
    text: str
    language: str
    segments: list[Segment]
    duration_ms: int                  # engine-side processing time
    windows: int = 0                  # 30 s seek-loop windows decoded


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def parse_window_segments(tokenizer, content: list[int], time_offset: float,
                          segment_duration: float, segment_frames: int, *,
                          avg_logprob: float, no_speech_prob: float,
                          compression_ratio: float, temperature: float
                          ) -> tuple[list[Segment], int]:
    """Split one 30 s window's tokens into timestamped segments and compute
    the seek advance — whisper's timestamp-pair consumption logic, shared
    by the one-shot engine, the CLI batch path, and the long-form batched
    driver (runtime/longform.py)."""
    sp = tokenizer.special
    ts = np.array([t >= sp.timestamp_begin for t in content], bool)
    mk = lambda start, end, toks: Segment(
        id=0, start=start, end=end,
        text=tokenizer.decode(toks),
        tokens=[t for t in toks if t < sp.eot],
        avg_logprob=avg_logprob, no_speech_prob=no_speech_prob,
        compression_ratio=compression_ratio, temperature=temperature)

    if len(content) == 0:
        return [], segment_frames

    single_ending = (len(content) >= 2 and ts[-1] and not ts[-2])
    consecutive = [i + 1 for i in range(len(content) - 1)
                   if ts[i] and ts[i + 1]]
    segments: list[Segment] = []
    if consecutive:
        slices = list(consecutive)
        if single_ending:
            slices.append(len(content))
        last = 0
        for cur in slices:
            sliced = content[last:cur]
            start_t = (sliced[0] - sp.timestamp_begin) * TIME_PRECISION
            end_t = (sliced[-1] - sp.timestamp_begin) * TIME_PRECISION
            segments.append(mk(time_offset + start_t,
                               time_offset + end_t, sliced[1:-1]))
            last = cur
        if single_ending:
            frames_advance = segment_frames
        else:
            last_ts = content[last - 1] - sp.timestamp_begin
            frames_advance = max(
                1, int(last_ts * TIME_PRECISION * FRAMES_PER_SECOND))
    else:
        duration = segment_duration
        ts_tokens = [t for t in content if t >= sp.timestamp_begin]
        if ts_tokens and ts_tokens[-1] != sp.timestamp_begin:
            duration = (ts_tokens[-1] - sp.timestamp_begin) \
                * TIME_PRECISION
        segments.append(mk(time_offset, time_offset + duration,
                           [t for t in content
                            if t < sp.timestamp_begin]))
        frames_advance = segment_frames
    return segments, max(1, frames_advance)


def default_model_dir() -> str:
    return os.environ.get(
        "OPENHUSH_MODEL_DIR",
        os.path.join(os.path.expanduser("~"), ".local", "share",
                     "openhush-tpu", "models"))


class WhisperEngine:
    """One loaded Whisper model + compiled programs.

    Parity: WhisperEngine (src/engine/whisper.rs:110-179) — `new` loads the
    model and pre-allocates state; `transcribe` runs the full pipeline.
    """

    def __init__(self, model: str = "tiny",
                 model_path: Optional[str] = None,
                 language: str = "auto", translate: bool = False,
                 dtype: str = "bfloat16",
                 vocab_dir: Optional[str] = None,
                 allow_random_init: bool = False,
                 quantize_weights: Optional[bool] = None,
                 quantize_encoder: Optional[bool] = None,
                 draft_model: Optional[str] = None,
                 params=None):
        self.cfg = get_config(model)
        self.model_name = model
        self.language = language
        self.translate = translate
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

        path = model_path or os.path.join(default_model_dir(),
                                          f"{model}.npz")
        if params is not None:
            # Injected device-resident pytree (bench/tests): reuse the
            # caller's weights instead of loading a second ~3 GB copy.
            # The activation dtype follows the injected weights.
            self.params = params
            self.dtype = jnp.asarray(params["decoder"]["pos_emb"]).dtype
            self.random_init = False
        elif os.path.exists(path):
            from openhush_tpu.utils.checkpoint import load_params
            params = load_params(path)     # npz file or Orbax directory
            self.params = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype), params)
            self.random_init = False
        elif allow_random_init:
            self.params = whisper.init_params(
                self.cfg, jax.random.PRNGKey(0), dtype=self.dtype)
            self.random_init = True
        else:
            raise FileNotFoundError(
                f"Model not found: {path}\n"
                f"Convert a HF checkpoint with: "
                f"python -m openhush_tpu.cli model convert {model} "
                f"--hf-path /path/to/hf_checkpoint")
        if quantize_weights is None:
            from openhush_tpu.utils.quant_flags import int8_rung_enabled
            env_w = os.environ.get("OPENHUSH_INT8_WEIGHTS")
            if env_w is not None:
                # Explicit setting stays a hard switch both ways: =0 must
                # force bf16 even when the gate's int8_rung.ok marker
                # exists (it's the documented debugging kill-switch).
                quantize_weights = env_w == "1"
            else:
                quantize_weights = int8_rung_enabled()
        if quantize_weights:
            # int8 per-output-channel decoder weights: halves the largest
            # per-token HBM read; prob diff ~1e-4 vs bf16.
            self.params = whisper.quantize_decoder_weights(self.params)
        if quantize_encoder is None:
            from openhush_tpu.utils.quant_flags import int8_encoder_enabled
            quantize_encoder = int8_encoder_enabled()
        if quantize_encoder:
            # W8A8 encoder rung: int8 weights + per-row int8 activations
            # run every encoder projection on the int8 MXU path — the
            # encoder is COMPUTE-bound, so this attacks its measured
            # floor directly (853.9 → 729.0 ms at large-v3 B=32 on v5e).
            # Default-off until the gate's real-weight WER run drops
            # int8_encoder.ok (tools/checkpoint_gate.py).
            self.params = whisper.quantize_encoder_weights(self.params)
        self.tokenizer = WhisperTokenizer.for_model(
            model, vocab_dir or os.path.dirname(path))
        self._encode = jax.jit(
            lambda p, m: whisper.encode(self.cfg, p, m))
        # Production (bf16) path quantizes cross-KV to int8: halves the
        # dominant decode-step HBM read at argmax-identical accuracy.
        if self.dtype == jnp.bfloat16:
            self._cross_kv = jax.jit(
                lambda p, f: whisper.compute_cross_kv_quant(self.cfg, p, f))
        else:
            self._cross_kv = jax.jit(
                lambda p, f: whisper.compute_cross_kv(self.cfg, p, f))
        # Speculative decoding (token-exact, speed-only): a shallower
        # decoder sharing this model's encoder drafts tokens; e.g.
        # large-v3-turbo drafts for large-v3. OPENHUSH_DRAFT_MODEL or the
        # draft_model arg opts in.
        self.draft_cfg = self.draft_params = self._draft_cross_kv = None
        draft_model = draft_model or os.environ.get(
            "OPENHUSH_DRAFT_MODEL") or None
        if draft_model:
            self._init_draft(draft_model, allow_random_init)

    def _init_draft(self, draft_model: str,
                    allow_random_init: bool) -> None:
        dcfg = get_config(draft_model)
        if (dcfg.n_vocab != self.cfg.n_vocab
                or dcfg.n_audio_state != self.cfg.n_audio_state
                or dcfg.n_audio_ctx != self.cfg.n_audio_ctx):
            log.warning(
                "draft model %s incompatible with %s (vocab/encoder dims "
                "differ); speculative decoding disabled", draft_model,
                self.model_name)
            return
        dpath = os.path.join(default_model_dir(), f"{draft_model}.npz")
        if os.path.exists(dpath):
            from openhush_tpu.utils.checkpoint import load_params
            dparams = jax.tree.map(lambda a: jnp.asarray(a, self.dtype),
                                   load_params(dpath))
        elif allow_random_init:
            dparams = whisper.init_params(dcfg, jax.random.PRNGKey(1),
                                          dtype=self.dtype)
        else:
            log.warning("draft model checkpoint missing (%s); speculative "
                        "decoding disabled", dpath)
            return
        self.draft_cfg, self.draft_params = dcfg, dparams
        self._draft_cross_kv = jax.jit(
            lambda p, f: whisper.compute_cross_kv(dcfg, p, f))
        log.info("speculative decoding: %s drafts for %s", draft_model,
                 self.model_name)

    # -- single-window decode with temperature fallback ----------------------

    def _decode_window(self, cross_kv, language: str,
                       prompt_ids: list[int],
                       opts: decoding.DecodingOptions,
                       draft_xkv=None) -> tuple[
                           decoding.DecodingResult, float, float]:
        """Run decode with whisper's temperature fallback ladder. Returns
        (result, compression_ratio, text) for batch row 0."""
        tok = self.tokenizer
        for ti, t in enumerate(TEMPERATURES):
            o = dataclasses.replace(opts, temperature=t,
                                    language=language)
            if t == 0.0 and opts.beam_size:
                from openhush_tpu.models.whisper import beam
                result = beam.decode_beam(
                    self.cfg, self.params, cross_kv, tok, o,
                    prompt_ids=prompt_ids)
            elif t == 0.0 and draft_xkv is not None:
                from openhush_tpu.models.whisper import speculative
                result = speculative.decode_speculative(
                    self.cfg, self.params, self.draft_cfg,
                    self.draft_params, cross_kv, draft_xkv, tok, o,
                    prompt_ids=prompt_ids)
            else:
                result = decoding.decode_greedy(
                    self.cfg, self.params, cross_kv, tok, o,
                    prompt_ids=prompt_ids,
                    rng=jax.random.PRNGKey(ti))
            content = self._content_tokens(result)
            text = tok.decode(content)
            cr = compression_ratio(text)
            needs_fallback = (
                cr > COMPRESSION_RATIO_THRESHOLD
                or result.avg_logprob[0] < LOGPROB_THRESHOLD)
            if result.no_speech_prob[0] > NO_SPEECH_THRESHOLD and \
                    result.avg_logprob[0] < LOGPROB_THRESHOLD:
                break  # silence: fallback won't help
            if not needs_fallback or t == TEMPERATURES[-1]:
                break
        return result, cr, text

    def _content_tokens(self, result: decoding.DecodingResult,
                        row: int = 0) -> list[int]:
        eot = self.tokenizer.special.eot
        toks = result.tokens[row, result.prompt_len:]
        out = []
        for t in toks:
            if t == eot:
                break
            out.append(int(t))
        return out

    # -- long-form transcription ---------------------------------------------

    def transcribe(self, audio: np.ndarray,
                   language: Optional[str] = None,
                   translate: Optional[bool] = None,
                   without_timestamps: bool = False,
                   condition_on_previous_text: bool = True,
                   beam_size: Optional[int] = None,
                   max_new_tokens: Optional[int] = None,
                   ) -> TranscriptionResult:
        """Transcribe mono 16 kHz float32 audio of any length (validated to
        the same limits as the reference FFI guard)."""
        t0 = time.monotonic()
        validation.validate_audio(audio)
        language = language if language is not None else self.language
        translate = self.translate if translate is None else translate
        task = "translate" if translate else "transcribe"
        tok = self.tokenizer
        sp = tok.special

        n_samples = len(audio)
        content_frames = n_samples // mel_ops.HOP_LENGTH

        detected_language: Optional[str] = None
        if language not in ("auto", "", None):
            detected_language = language

        segments: list[Segment] = []
        all_tokens: list[int] = []
        prompt_reset_since = 0
        seek = 0  # in mel frames
        windows = 0

        opts = decoding.DecodingOptions(
            task=task, without_timestamps=without_timestamps,
            beam_size=beam_size,
            max_new_tokens=(max_new_tokens
                            or decoding.DecodingOptions.max_new_tokens))

        while seek < content_frames:
            windows += 1
            time_offset = seek * mel_ops.HOP_LENGTH / mel_ops.SAMPLE_RATE
            window = audio[seek * mel_ops.HOP_LENGTH:
                           seek * mel_ops.HOP_LENGTH + mel_ops.N_SAMPLES]
            segment_frames = min(len(window) // mel_ops.HOP_LENGTH,
                                 content_frames - seek)
            segment_duration = segment_frames / FRAMES_PER_SECOND
            from openhush_tpu.ops import frontend_pallas
            window = np.asarray(mel_ops.pad_or_trim(window))
            mel = frontend_pallas.log_mel(
                jnp.asarray(window), n_mels=self.cfg.n_mels)[None]
            feats = self._encode(self.params, mel.astype(self.dtype))
            cross_kv = self._cross_kv(self.params, feats)
            draft_xkv = (self._draft_cross_kv(self.draft_params, feats)
                         if self._draft_cross_kv is not None else None)

            if detected_language is None:
                langs, _ = decoding.detect_language(
                    self.cfg, self.params, cross_kv, tok)
                detected_language = langs[0]

            prompt_ids: list[int] = []
            if condition_on_previous_text and all_tokens[prompt_reset_since:]:
                prev = all_tokens[prompt_reset_since:]
                room = self.cfg.n_text_ctx // 2 - 1
                prompt_ids = [sp.start_of_prev] + prev[-room:]

            result, cr, text = self._decode_window(
                cross_kv, detected_language, prompt_ids, opts,
                draft_xkv=draft_xkv)
            content = self._content_tokens(result)

            # Silence skip (whisper's no_speech rule).
            if (result.no_speech_prob[0] > NO_SPEECH_THRESHOLD
                    and result.avg_logprob[0] < LOGPROB_THRESHOLD):
                seek += segment_frames
                continue

            new_segments, frames_advance = self._parse_window_segments(
                content, time_offset, segment_duration, segment_frames,
                result, cr)
            for s in new_segments:
                s.id = len(segments)
                segments.append(s)
                all_tokens.extend(s.tokens)
            seek += frames_advance

            if not condition_on_previous_text or result.temperature > 0.5:
                prompt_reset_since = len(all_tokens)

        text = "".join(s.text for s in segments).strip()
        duration_ms = int((time.monotonic() - t0) * 1000)
        return TranscriptionResult(
            text=text, language=detected_language or "en",
            segments=segments, duration_ms=duration_ms, windows=windows)

    def _parse_window_segments(self, content: list[int], time_offset: float,
                               segment_duration: float, segment_frames: int,
                               result, cr: float):
        return parse_window_segments(
            self.tokenizer, content, time_offset, segment_duration,
            segment_frames, avg_logprob=float(result.avg_logprob[0]),
            no_speech_prob=float(result.no_speech_prob[0]),
            compression_ratio=cr, temperature=float(result.temperature))

    # -- startup benchmark (chunk-interval auto-tune) ------------------------

    def benchmark_chunk_interval(self, margin: float = 0.2,
                                 fallback: float = 5.0) -> float:
        """Measure transcription overhead on 2 s of silence and derive the
        streaming chunk interval = overhead × (1+margin).
        Parity: src/engine/whisper.rs:329-382."""
        silence = np.zeros(2 * mel_ops.SAMPLE_RATE, np.float32)
        try:
            self.transcribe(silence, language="en")  # warm compile
            t0 = time.monotonic()
            self.transcribe(silence, language="en")
            overhead = time.monotonic() - t0
            return max(0.5, min(fallback * 4, overhead * (1.0 + margin)))
        except Exception:
            return fallback
