"""THE real-checkpoint gate: one command that converts every model
family, runs every validation stage, and emits a machine-readable
report — so the day-one run on a networked machine is execute-only.

    python tools/checkpoint_gate.py --model large-v3 \
        --work /tmp/openhush-checkpoints \
        --dataset /data/LibriSpeech/test-clean [--limit 200]

Stages (each recorded in gate_report.json as {ok, seconds, detail}):

  1. whisper_convert   HF checkpoint → npz (openhush model convert)
  2. whisper_parity    tools/parity_gate.py vs torch HF on sample WAVs
  3. wer_bf16          engine WER on the LibriSpeech-layout dataset
  4. wer_int8_self     SERVING-path WER with the int8 self-cache rung
  4b. wer_beam_bf16 /  BEAM-serving-path WER (BeamEngineServer, K=5)
      wer_beam_int8    bf16 vs int8 self-cache — the marker flips both
                       server families, so both drifts gate it
  5. int8_decision     greedy AND beam drift < 0.1 abs → drops
                       models/int8_self_cache.ok (EngineServer and
                       BeamEngineServer flip their default on it)
  6. wer_gelu_tanh     engine WER with OPENHUSH_GELU=tanh (fresh
                       interpreter — GELU mode is per-process)
  7. gelu_decision     drift < 0.1 abs → drops models/gelu_tanh.ok
                       (model._gelu flips its default on that marker;
                       −16% encoder time)
  8. wer_int8_rung     SERVING-path WER with the FULL combined int8 rung
                       (int8 decoder weights + int8 self-cache + int8
                       cross-KV + fused quantize kernel — one flag,
                       utils/quant_flags.py; measured 295x vs bf16 250x)
  9. int8_rung_decision drift < 0.1 abs → drops models/int8_rung.ok
                       (engine + server flip the whole rung on it)
  9b. wer_int8_encoder SERVING-path WER with the W8A8 encoder rung
      + decision       (int8 encoder weights + per-row int8 activations
                       on the MXU; 853.9 → 729.0 ms large-v3 B=32
                       encode) → drops models/int8_encoder.ok
 10. spec_accept_rate  real-draft acceptance: per-position agreement of
                       the draft's greedy argmax with the big model's
                       next token over dataset decodes — the measured
                       input to the spec-policy crossover
 11. m2m100_convert    HF M2M-100 → npz
 12. aux_convert       Silero / openWakeWord / wespeaker / RNNoise via
                       `model convert-aux` + tools/validate_aux.py
                       (resolves the Silero STFT pad-mode into the npz)
 13. silero_sanity     converted Silero over a speech-like WAV vs
                       silence: p(speech) > p(silence) with headroom
                       (real weights; dryrun only checks the range)
 14. diarization_der   DER/JER over an RTTM-layout dataset dir
                       (--diarization-dataset: <name>.wav + <name>.rttm,
                       AMI-style) with a fresh speaker bank per file

`--offline-dryrun` builds SYNTHETIC checkpoints for every family
(random weights, real file formats) and executes all stages end-to-end
with no network — CI runs this nightly (tests/test_checkpoint_gate.py),
so the only thing the networked run adds is real weights.

Fetching is the caller's job (tools/fetch_and_validate_all.sh wraps
this with the download steps). Reference behavior being gated:
real-GGML loading + transcription in src/engine/whisper.rs:159-287.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _pythonpath() -> str:
    """REPO prepended to the inherited PYTHONPATH — REPLACING it would
    drop site dirs the host injects (e.g. the axon TPU plugin's site
    path), killing backend init inside gate subprocesses."""
    inherited = os.environ.get("PYTHONPATH", "")
    return REPO + (os.pathsep + inherited if inherited else "")

INT8_WER_DRIFT_MAX = 0.001   # 0.1 absolute WER percentage points


def _cli(*argv) -> int:
    from openhush_tpu import cli
    return cli.main(list(argv))


class GateRunner:
    def __init__(self, report_path: str):
        self.report_path = report_path
        self.report: dict = {"stages": {}, "ok": True}

    def stage(self, name, fn, required=True):
        t0 = time.monotonic()
        entry = {"ok": False, "seconds": 0.0, "detail": None}
        try:
            entry["detail"] = fn()
            entry["ok"] = True
        except Exception as e:  # noqa: BLE001 — recorded, gate continues
            entry["detail"] = f"{type(e).__name__}: {e}"
            if required:
                self.report["ok"] = False
        entry["seconds"] = round(time.monotonic() - t0, 2)
        self.report["stages"][name] = entry
        print(f"[gate] {name}: {'ok' if entry['ok'] else 'FAIL'} "
              f"({entry['seconds']}s) {entry['detail']}", flush=True)
        self.write()
        return entry["ok"]

    def write(self):
        with open(self.report_path, "w") as f:
            json.dump(self.report, f, indent=2)


# ---------------------------------------------------------------------------
# WER helpers
# ---------------------------------------------------------------------------

def _engine_wer(model: str, dataset: str, limit):
    from openhush_tpu.runtime.engine import WhisperEngine
    from openhush_tpu.utils.wer import evaluate_librispeech

    eng = WhisperEngine(model, language="en", allow_random_init=os.environ
                        .get("OPENHUSH_ALLOW_RANDOM_INIT") == "1")
    res = evaluate_librispeech(eng, dataset, limit=limit)
    return res


class _ServerEngine:
    """engine.transcribe-shaped adapter over EngineServer — the WER runs
    for the int8 rungs go through the ACTUAL serving path.
    quantize_weights=True + int8_self_cache=True is the FULL combined
    rung (utils/quant_flags.py): int8 decoder weights + int8 self-cache
    + int8 cross-KV (always on in serving) + fused quantize kernel."""

    def __init__(self, model: str, int8_self_cache: bool,
                 quantize_weights: bool = False, beam_size: int = 0,
                 quantize_encoder: bool = False):
        import jax.numpy as jnp

        from openhush_tpu.runtime.engine import WhisperEngine
        from openhush_tpu.runtime.server import EngineServer

        eng = WhisperEngine(model, language="en", allow_random_init=os
                            .environ.get("OPENHUSH_ALLOW_RANDOM_INIT")
                            == "1", quantize_weights=quantize_weights,
                            quantize_encoder=quantize_encoder)
        guards = ({} if not getattr(eng, "random_init", False)
                  else dict(temperatures=(0.0,),
                            logprob_threshold=-1e9,
                            no_speech_threshold=2.0))
        if beam_size:
            from openhush_tpu.runtime.beam_server import BeamEngineServer
            self.server = BeamEngineServer(
                eng.cfg, eng.params, tokenizer=eng.tokenizer,
                beam_size=beam_size, n_slots=2, dtype=jnp.bfloat16,
                int8_self_cache=int8_self_cache, **guards)
        else:
            self.server = EngineServer(eng.cfg, eng.params,
                                       tokenizer=eng.tokenizer, n_slots=4,
                                       dtype=jnp.bfloat16,
                                       int8_self_cache=int8_self_cache,
                                       **guards)
        self._win = 0

    def transcribe(self, audio, **kw):
        import dataclasses

        sid = self.server.open_session()
        self._win += 1
        self.server.submit_window(sid, audio, window_id=self._win,
                                  language="en", timestamps=False)
        res = None
        for _ in range(5000):
            self.server.run_once()
            res = self.server.poll(sid)
            if res is not None:
                break
        self.server.close_session(sid)

        @dataclasses.dataclass
        class R:
            text: str
        return R(text=res.text if res else "")


def _server_wer(model: str, dataset: str, limit, int8: bool,
                rung: bool = False, beam_size: int = 0,
                encoder: bool = False):
    from openhush_tpu.utils.wer import evaluate_librispeech
    eng = _ServerEngine(model, int8_self_cache=int8,
                        quantize_weights=rung, beam_size=beam_size,
                        quantize_encoder=encoder)
    return evaluate_librispeech(eng, dataset, limit=limit)


def _accept_rate(model: str, draft_model: str, dataset: str, limit):
    """Per-position agreement between the draft's greedy argmax and the
    big model's emitted next token over real decodes — the acceptance
    probability of speculative decoding with this draft (the measured
    input to the spec-policy crossover, runtime/server.py spec_policy).
    Teacher-forces the draft over the big model's greedy output in ONE
    decode pass per utterance; raw (unfiltered) draft argmax, which is
    what batcher.spec_step compares against for notimestamps decodes."""
    import jax.numpy as jnp
    import numpy as np

    from openhush_tpu.audio.wav import load_wav
    from openhush_tpu.models.whisper import decoding
    from openhush_tpu.models.whisper import model as whisper
    from openhush_tpu.ops import frontend_pallas, mel as mel_ops
    from openhush_tpu.runtime.engine import WhisperEngine
    from openhush_tpu.utils.wer import iter_librispeech

    eng = WhisperEngine(model, language="en", draft_model=draft_model,
                        allow_random_init=os.environ.get(
                            "OPENHUSH_ALLOW_RANDOM_INIT") == "1")
    if eng.draft_cfg is None:
        raise RuntimeError(f"draft {draft_model!r} failed to initialize")
    opts = decoding.DecodingOptions(language="en", without_timestamps=True)
    eot = eng.tokenizer.special.eot
    match = total = 0
    for n, (path, _ref) in enumerate(iter_librispeech(dataset)):
        if limit and n >= limit:
            break
        audio = load_wav(path)
        a = np.zeros(mel_ops.N_SAMPLES, np.float32)
        a[:len(audio)] = audio[:mel_ops.N_SAMPLES]
        mel = frontend_pallas.log_mel(
            jnp.asarray(a), n_mels=eng.cfg.n_mels)[None].astype(eng.dtype)
        feats = eng._encode(eng.params, mel)
        xkv = eng._cross_kv(eng.params, feats)
        dxkv = eng._draft_cross_kv(eng.draft_params, feats)
        res = decoding.decode_greedy(eng.cfg, eng.params, xkv,
                                     eng.tokenizer, opts)
        row = [int(t) for t in res.tokens[0]]
        end = res.prompt_len
        while end < len(row) and row[end] != eot:
            end += 1
        seq = row[:min(end + 1, len(row))]
        if len(seq) <= res.prompt_len:
            continue
        cache_len = ((len(seq) + 63) // 64) * 64
        dcache = whisper.init_kv_cache(eng.draft_cfg, 1, dtype=eng.dtype,
                                       max_len=cache_len)
        lg, _ = whisper.decode(eng.draft_cfg, eng.draft_params,
                               jnp.asarray([seq], jnp.int32),
                               jnp.int32(0), dcache, dxkv)
        pred = np.asarray(jnp.argmax(lg[0], -1))
        for i in range(res.prompt_len - 1, len(seq) - 1):
            total += 1
            match += int(pred[i] == seq[i + 1])
    rate = match / max(total, 1)
    return {"accept": round(rate, 4), "positions": total,
            "draft": draft_model,
            # Expected emitted tokens/iteration at K=4 (geometric chain).
            "expected_tokens_per_iter_k4": round(
                1 + rate + rate ** 2 + rate ** 3, 3)}


def _silero_sanity(strict: bool):
    """Converted-Silero smoke: p(speech-like WAV) vs p(silence). With
    real weights (strict) speech must clear silence by a margin; the
    random-weight dryrun only pins the execution path and [0, 1] range."""
    import numpy as np

    from openhush_tpu.audio.wav import load_wav
    from openhush_tpu.models.silero import SileroVad
    from openhush_tpu.runtime.engine import default_model_dir

    path = os.path.join(default_model_dir(), "aux", "silero.npz")
    vad = SileroVad.load(path)
    speech = load_wav(os.path.join(REPO, "tests", "data",
                                   "speechlike.wav"))
    silence = np.zeros(16000, np.float32)

    def mean_prob(audio):
        vad.reset()
        cs = vad.chunk_size
        probs = [vad.process(audio[i:i + cs]).probability
                 for i in range(0, max(len(audio) - cs + 1, 1), cs)]
        return float(np.mean(probs)) if probs else 0.0

    p_speech, p_silence = mean_prob(speech), mean_prob(silence)
    ok_range = 0.0 <= p_silence <= 1.0 and 0.0 <= p_speech <= 1.0
    if not ok_range:
        raise RuntimeError(f"probabilities out of range: "
                           f"speech={p_speech} silence={p_silence}")
    if strict and not (p_speech > 0.5 > p_silence):
        raise RuntimeError(
            f"threshold sanity failed: p(speech)={p_speech:.3f} "
            f"p(silence)={p_silence:.3f} (expected >0.5/<0.5)")
    return {"p_speech": round(p_speech, 4),
            "p_silence": round(p_silence, 4), "strict": strict}


# ---------------------------------------------------------------------------
# Synthetic checkpoint builders (offline dry-run)
# ---------------------------------------------------------------------------

def build_synthetic(work: str) -> dict:
    """Random-weight checkpoints in every REAL file format the gate
    consumes. Reuses the test-suite builders (single source of truth for
    the synthetic formats)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import numpy as np
    import torch
    import transformers
    from safetensors.numpy import save_file

    import test_aux_convert as aux_builders
    import test_convert_aux_cli as cli_builders

    paths = {}
    os.makedirs(work, exist_ok=True)

    # Whisper (HF layout: config.json + model.safetensors)
    wdir = os.path.join(work, "whisper")
    os.makedirs(wdir, exist_ok=True)
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None)
    torch.manual_seed(0)
    m = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    save_file({k: v.detach().numpy() for k, v in m.state_dict().items()},
              os.path.join(wdir, "model.safetensors"))
    with open(os.path.join(wdir, "config.json"), "w") as f:
        f.write(hf_cfg.to_json_string())
    paths["whisper"] = wdir

    # M2M-100 (HF layout)
    mdir = os.path.join(work, "m2m")
    os.makedirs(mdir, exist_ok=True)
    # Dims match m2m100.CONFIGS["test"] so `convert-m2m100 test` maps it.
    m2m_cfg = transformers.M2M100Config(
        vocab_size=1000, d_model=64, encoder_layers=2,
        decoder_layers=2, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_dim=128,
        decoder_ffn_dim=128, max_position_embeddings=1024)
    torch.manual_seed(1)
    mm = transformers.M2M100ForConditionalGeneration(m2m_cfg).eval()
    save_file({k: v.detach().numpy() for k, v in mm.state_dict().items()},
              os.path.join(mdir, "model.safetensors"))
    with open(os.path.join(mdir, "config.json"), "w") as f:
        f.write(m2m_cfg.to_json_string())
    paths["m2m"] = mdir

    # Aux families via the shared test builders.
    import pathlib
    tp = pathlib.Path(work)
    paths["silero_jit"] = cli_builders._make_silero_jit(tp)
    paths["wakeword_embedding"] = cli_builders._wakeword_embedding_onnx(tp)
    paths["wakeword_classifier"] = cli_builders._wakeword_classifier_onnx(tp)
    paths["wespeaker"] = cli_builders._wespeaker_onnx(tp)
    rng = np.random.default_rng(7)
    rnnn = os.path.join(work, "rnnoise.rnnn")
    text, _raws = aux_builders._build_model_text(rng)
    with open(rnnn, "w") as f:
        f.write(text)
    paths["rnnoise"] = rnnn

    # RTTM-layout diarization dataset (synthetic meetings in the exact
    # wav+rttm shape the real AMI run uses).
    from openhush_tpu.utils import der as der_mod
    ddir = os.path.join(work, "diarization")
    os.makedirs(ddir, exist_ok=True)
    import wave as _wave
    rngd = np.random.default_rng(21)
    for m in range(2):
        audio, turns = der_mod.synth_meeting(rngd, 2, secs=12.0)
        with _wave.open(os.path.join(ddir, f"meeting{m}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((audio * 32767).astype(np.int16).tobytes())
        der_mod.write_rttm(os.path.join(ddir, f"meeting{m}.rttm"),
                           f"meeting{m}", turns)
    paths["diarization"] = ddir

    # Tiny LibriSpeech-layout dataset (speaker/chapter/utt + trans.txt).
    ds = os.path.join(work, "LibriSpeech", "1", "1")
    os.makedirs(ds, exist_ok=True)
    import wave
    lines = []
    rng2 = np.random.default_rng(11)
    for i in range(2):
        utt = f"1-1-{i:04d}"
        sig = (0.1 * rng2.standard_normal(16000)).astype(np.float32)
        with wave.open(os.path.join(ds, utt + ".wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((sig * 32767).astype(np.int16).tobytes())
        lines.append(f"{utt} HELLO WORLD TEST {i}")
    with open(os.path.join(ds, "1-1.trans.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    paths["dataset"] = os.path.join(work, "LibriSpeech")
    return paths


# ---------------------------------------------------------------------------

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--work", default="/tmp/openhush-checkpoints")
    ap.add_argument("--dataset", default=None,
                    help="LibriSpeech-layout split dir (test-clean)")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--report", default=None)
    ap.add_argument("--offline-dryrun", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--draft-model", default=None,
                    help="draft checkpoint for the accept-rate stage "
                    "(default: large-v3-turbo when gating large-v3)")
    ap.add_argument("--diarization-dataset", default=None,
                    help="RTTM-layout dir: <name>.wav + <name>.rttm "
                    "(AMI-style) for the DER stage")
    args = ap.parse_args()

    report_path = args.report or os.path.join(args.work,
                                              "gate_report.json")
    os.makedirs(args.work, exist_ok=True)
    gate = GateRunner(report_path)
    model = args.model

    if args.offline_dryrun:
        os.environ["OPENHUSH_ALLOW_RANDOM_INIT"] = "1"
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        paths = build_synthetic(os.path.join(args.work, "synthetic"))
        model = "test"
        args.dataset = paths["dataset"]
        args.limit = args.limit or 2
        args.draft_model = args.draft_model or "test-draft"
        args.diarization_dataset = (args.diarization_dataset
                                    or paths["diarization"])
    else:
        paths = {
            "whisper": os.path.join(args.work, "whisper"),
            "m2m": os.path.join(args.work, "m2m"),
            "silero_jit": os.path.join(args.work, "silero_vad.jit"),
            "wakeword_embedding": os.path.join(args.work,
                                               "embedding_model.onnx"),
            "wakeword_classifier": os.path.join(args.work,
                                                "hey_jarvis.onnx"),
            "wespeaker": os.path.join(args.work, "wespeaker.onnx"),
            "rnnoise": os.path.join(args.work, "rnnoise.rnnn"),
        }

    from openhush_tpu.runtime.engine import default_model_dir

    gate.stage("whisper_convert", lambda: _cli(
        "model", "convert", model, "--hf-path", paths["whisper"]) == 0
        and f"{model}.npz" or (_ for _ in ()).throw(
            RuntimeError("convert failed")))

    if not args.skip_parity:
        def parity():
            wavs = [os.path.join(REPO, "tests", "data", w)
                    for w in ("speechlike.wav", "tone_sweep.wav")]
            rc = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools",
                                              "parity_gate.py"),
                 model, "--hf-path", paths["whisper"], "--wavs", *wavs],
                capture_output=True, text=True, timeout=3600,
                cwd=REPO, env={**os.environ, "PYTHONPATH": _pythonpath()})
            if rc.returncode != 0:
                raise RuntimeError(rc.stdout[-400:] + rc.stderr[-400:])
            return "token parity ok"
        gate.stage("whisper_parity", parity)

    if args.dataset:
        wer_holder = {}

        def wer_bf16():
            r = _engine_wer(model, args.dataset, args.limit)
            wer_holder["bf16"] = r.wer
            return {"wer": round(r.wer, 4), "ref_words": r.n_ref_words}

        def wer_int8():
            r = _server_wer(model, args.dataset, args.limit, int8=True)
            wer_holder["int8"] = r.wer
            return {"wer": round(r.wer, 4), "ref_words": r.n_ref_words}

        def wer_beam_bf16():
            r = _server_wer(model, args.dataset, args.limit, int8=False,
                            beam_size=5)
            wer_holder["beam_bf16"] = r.wer
            return {"wer": round(r.wer, 4), "ref_words": r.n_ref_words}

        def wer_beam_int8():
            # The int8_self_cache.ok marker flips the default for BOTH
            # server families (BeamEngineServer inherits the resolution),
            # so the decision must also see the beam path's drift: the
            # grouped beam step quantizes through a different attention
            # formulation (model.decode_beam_step).
            r = _server_wer(model, args.dataset, args.limit, int8=True,
                            beam_size=5)
            wer_holder["beam_int8"] = r.wer
            return {"wer": round(r.wer, 4), "ref_words": r.n_ref_words}

        def decide():
            need = ("bf16", "int8", "beam_bf16", "beam_int8")
            if any(k not in wer_holder for k in need):
                raise RuntimeError("WER stages incomplete")
            drift = wer_holder["int8"] - wer_holder["bf16"]
            beam_drift = wer_holder["beam_int8"] - wer_holder["beam_bf16"]
            marker = os.path.join(default_model_dir(),
                                  "int8_self_cache.ok")
            random_init = os.environ.get(
                "OPENHUSH_ALLOW_RANDOM_INIT") == "1"
            ok = (drift < INT8_WER_DRIFT_MAX
                  and beam_drift < INT8_WER_DRIFT_MAX)
            if ok and not random_init:
                with open(marker, "w") as f:
                    json.dump({"drift": drift, "beam_drift": beam_drift,
                               "bf16": wer_holder["bf16"],
                               "int8": wer_holder["int8"],
                               "beam_bf16": wer_holder["beam_bf16"],
                               "beam_int8": wer_holder["beam_int8"]}, f)
                return {"drift": round(drift, 5),
                        "beam_drift": round(beam_drift, 5),
                        "default_flipped": True}
            return {"drift": round(drift, 5),
                    "beam_drift": round(beam_drift, 5),
                    "default_flipped": False,
                    "note": "random-init dryrun never flips"
                    if random_init else "drift too large"}

        def wer_gelu_tanh():
            # Subprocess: the GELU mode is resolved once per process at
            # trace time, so the tanh run needs a fresh interpreter.
            code = (
                "import json, sys; sys.path.insert(0, {repo!r});"
                "sys.path.insert(0, {tools!r});"
                "import checkpoint_gate as g;"
                "r = g._engine_wer({model!r}, {ds!r}, {lim!r});"
                "print('GELU_WER ' + json.dumps({{'wer': r.wer}}))"
            ).format(repo=REPO, tools=os.path.join(REPO, "tools"),
                     model=model, ds=args.dataset, lim=args.limit)
            rc = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=7200, cwd=REPO,
                env={**os.environ, "PYTHONPATH": _pythonpath(),
                     "OPENHUSH_GELU": "tanh"})
            for line in rc.stdout.splitlines():
                if line.startswith("GELU_WER "):
                    wer_holder["gelu_tanh"] = json.loads(
                        line[len("GELU_WER "):])["wer"]
                    return {"wer": round(wer_holder["gelu_tanh"], 4)}
            raise RuntimeError(rc.stdout[-400:] + rc.stderr[-400:])

        def decide_gelu():
            if "bf16" not in wer_holder or "gelu_tanh" not in wer_holder:
                raise RuntimeError("WER stages incomplete")
            drift = wer_holder["gelu_tanh"] - wer_holder["bf16"]
            random_init = os.environ.get(
                "OPENHUSH_ALLOW_RANDOM_INIT") == "1"
            if drift < INT8_WER_DRIFT_MAX and not random_init:
                marker = os.path.join(default_model_dir(), "gelu_tanh.ok")
                with open(marker, "w") as f:
                    json.dump({"drift": drift,
                               "bf16": wer_holder["bf16"],
                               "gelu_tanh": wer_holder["gelu_tanh"]}, f)
                return {"drift": round(drift, 5), "default_flipped": True}
            return {"drift": round(drift, 5), "default_flipped": False,
                    "note": "random-init dryrun never flips"
                    if random_init else "drift too large"}

        def wer_int8_rung():
            r = _server_wer(model, args.dataset, args.limit, int8=True,
                            rung=True)
            wer_holder["rung"] = r.wer
            return {"wer": round(r.wer, 4), "ref_words": r.n_ref_words}

        def decide_rung():
            if "bf16" not in wer_holder or "rung" not in wer_holder:
                raise RuntimeError("WER stages incomplete")
            from openhush_tpu.utils.quant_flags import RUNG_MARKER
            drift = wer_holder["rung"] - wer_holder["bf16"]
            random_init = os.environ.get(
                "OPENHUSH_ALLOW_RANDOM_INIT") == "1"
            if drift < INT8_WER_DRIFT_MAX and not random_init:
                marker = os.path.join(default_model_dir(), RUNG_MARKER)
                with open(marker, "w") as f:
                    json.dump({"drift": drift,
                               "bf16": wer_holder["bf16"],
                               "rung": wer_holder["rung"]}, f)
                return {"drift": round(drift, 5), "default_flipped": True}
            return {"drift": round(drift, 5), "default_flipped": False,
                    "note": "random-init dryrun never flips"
                    if random_init else "drift too large"}

        def wer_int8_encoder():
            # W8A8 encoder rung through the serving path: int8 encoder
            # weights + per-row int8 activations on the MXU
            # (model.quantize_encoder_weights). Separate decision from
            # the decoder rung — different bottleneck, different drift
            # profile (activations quantize too, so expect more drift
            # than weight-only).
            r = _server_wer(model, args.dataset, args.limit, int8=False,
                            encoder=True)
            wer_holder["encoder"] = r.wer
            return {"wer": round(r.wer, 4), "ref_words": r.n_ref_words}

        def decide_encoder():
            if "bf16" not in wer_holder or "encoder" not in wer_holder:
                raise RuntimeError("WER stages incomplete")
            from openhush_tpu.utils.quant_flags import ENCODER_MARKER
            drift = wer_holder["encoder"] - wer_holder["bf16"]
            random_init = os.environ.get(
                "OPENHUSH_ALLOW_RANDOM_INIT") == "1"
            if drift < INT8_WER_DRIFT_MAX and not random_init:
                marker = os.path.join(default_model_dir(), ENCODER_MARKER)
                with open(marker, "w") as f:
                    json.dump({"drift": drift,
                               "bf16": wer_holder["bf16"],
                               "encoder": wer_holder["encoder"]}, f)
                return {"drift": round(drift, 5), "default_flipped": True}
            return {"drift": round(drift, 5), "default_flipped": False,
                    "note": "random-init dryrun never flips"
                    if random_init else "drift too large"}

        draft_model = args.draft_model or (
            "large-v3-turbo" if model == "large-v3" else None)

        gate.stage("wer_bf16", wer_bf16)
        gate.stage("wer_int8_self", wer_int8)
        gate.stage("wer_beam_bf16", wer_beam_bf16)
        gate.stage("wer_beam_int8", wer_beam_int8)
        gate.stage("int8_decision", decide)
        gate.stage("wer_gelu_tanh", wer_gelu_tanh)
        gate.stage("gelu_decision", decide_gelu)
        gate.stage("wer_int8_rung", wer_int8_rung)
        gate.stage("int8_rung_decision", decide_rung)
        gate.stage("wer_int8_encoder", wer_int8_encoder)
        gate.stage("int8_encoder_decision", decide_encoder)
        if draft_model:
            gate.stage("spec_accept_rate", lambda: _accept_rate(
                model, draft_model, args.dataset, args.limit))

    m2m_name = "test" if args.offline_dryrun else "418M"
    gate.stage("m2m100_convert", lambda: _cli(
        "model", "convert-m2m100", m2m_name, "--hf-path", paths["m2m"])
        == 0 and "m2m100.npz" or (_ for _ in ()).throw(
            RuntimeError("convert failed")))

    def aux():
        done = []
        specs = [("silero", paths["silero_jit"], "silero"),
                 ("wakeword-embedding", paths["wakeword_embedding"],
                  None),
                 ("wakeword-classifier", paths["wakeword_classifier"],
                  None),
                 ("wespeaker", paths["wespeaker"], None),
                 ("rnnoise", paths["rnnoise"], "rnnoise")]
        aux_dir = os.path.join(default_model_dir(), "aux")
        installed = {"silero": "silero.npz",
                     "wakeword-embedding": "wakeword_embedding.onnx",
                     "wakeword-classifier": "wakeword_classifier.onnx",
                     "wespeaker": "wespeaker.onnx",
                     "rnnoise": "rnnoise.npz"}
        for kind, src, validator in specs:
            if _cli("model", "convert-aux", kind, src) != 0:
                raise RuntimeError(f"convert-aux {kind} failed")
            out = os.path.join(aux_dir, installed[kind])
            if validator:
                rc = subprocess.run(
                    [sys.executable,
                     os.path.join(REPO, "tools", "validate_aux.py"),
                     validator, src, out],
                    capture_output=True, text=True, timeout=1800,
                    cwd=REPO, env={**os.environ, "PYTHONPATH": _pythonpath()})
                if rc.returncode != 0:
                    raise RuntimeError(
                        f"validate_aux {kind}: "
                        f"{rc.stdout[-300:]}{rc.stderr[-300:]}")
            done.append(kind)
        return done

    gate.stage("aux_convert", aux)

    random_init = os.environ.get("OPENHUSH_ALLOW_RANDOM_INIT") == "1"
    gate.stage("silero_sanity",
               lambda: _silero_sanity(strict=not random_init))

    if args.diarization_dataset:
        def diar():
            from openhush_tpu.utils.der import evaluate_rttm_dataset
            r = evaluate_rttm_dataset(args.diarization_dataset,
                                      limit=args.limit)
            return {"der": round(r.der, 4), "jer": round(r.jer, 4),
                    "missed": round(r.missed, 4),
                    "false_alarm": round(r.false_alarm, 4),
                    "confusion": round(r.confusion, 4)}
        gate.stage("diarization_der", diar)

    gate.write()
    print(f"[gate] report: {report_path} "
          f"({'PASS' if gate.report['ok'] else 'FAIL'})")
    return 0 if gate.report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
