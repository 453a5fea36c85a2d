"""openhush CLI — command surface parity with the reference binary
(src/main.rs:49-218): start/stop/status/config/model/device/transcribe/
record/recording/service/secret/api-key/summarize/preferences/setup.

This module wires the subcommands; transcribe output is byte-compatible with
the reference (text block and JSON keys, src/main.rs:1025-1050).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_transcribe(sub):
    p = sub.add_parser("transcribe",
                       help="Transcribe audio file(s); multiple ≤30s files "
                            "batch through the continuous-batching server")
    p.add_argument("file", nargs="+")
    p.add_argument("--format", "-f", default="text",
                   help="text|json|srt|vtt|timestamped")
    p.add_argument("--model", "-m", default=None,
                   help="tiny|base|small|medium|large-v2|large-v3|large-v3-turbo")
    p.add_argument("--language", "-l", default=None)
    p.add_argument("--translate", action="store_true")
    p.add_argument("--beam-size", type=int, default=None)
    p.add_argument("--random-init", action="store_true",
                   help="run with random weights when no checkpoint exists "
                        "(smoke tests only)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--draft", default=None, metavar="MODEL",
                   help="speculative decoding draft (e.g. large-v3-turbo "
                        "for large-v3); token-exact, speed-only")
    return p


def cmd_transcribe(args) -> int:
    import os

    from openhush_tpu.audio.wav import load_wav
    from openhush_tpu.runtime.engine import WhisperEngine
    from openhush_tpu.text import formats
    from openhush_tpu.utils.config import Config

    files = args.file
    for f in files:
        if not os.path.exists(f):
            print(f"File not found: {f}", file=sys.stderr)
            return 1

    config = Config.load_or_default()
    model = args.model or config.transcription.effective_model()
    language = args.language or config.transcription.language

    t_load = time.monotonic()
    try:
        audios = [load_wav(f) for f in files]
    except (ValueError, OSError) as e:
        print(f"Cannot load audio: {e}", file=sys.stderr)
        return 1
    load_ms = (time.monotonic() - t_load) * 1000
    total_secs = sum(len(a) for a in audios) / 16000.0
    print(f"Loaded: {total_secs:.2f}s audio ({len(files)} file(s)) "
          f"in {load_ms:.0f}ms")

    import jax
    print(f"Loading model: {model}.npz "
          f"(backend: {jax.default_backend()})")
    t_model = time.monotonic()
    try:
        engine = WhisperEngine(model, language=language,
                               translate=args.translate, dtype=args.dtype,
                               allow_random_init=args.random_init or
                               os.environ.get(
                                   "OPENHUSH_ALLOW_RANDOM_INIT") == "1",
                               draft_model=args.draft
                               or config.transcription.draft_model
                               or None)
    except FileNotFoundError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(f"Model loaded in {(time.monotonic() - t_model) * 1000:.0f}ms")

    print("Transcribing...")
    t0 = time.monotonic()
    if len(files) > 1:
        # Multi-file jobs — short OR long-form — batch through the
        # continuous-batching server: each file runs its own seek loop,
        # the server batches in-flight windows across files
        # (runtime/longform.py). The reference processes files strictly
        # sequentially (src/main.rs:948-1051).
        results = _transcribe_batch(engine, audios, args)
    else:
        results = [engine.transcribe(a, language=args.language,
                                     translate=args.translate,
                                     beam_size=args.beam_size)
                   for a in audios]
    transcribe_s = time.monotonic() - t0

    fmt = args.format.lower()
    payloads = []
    for path, audio, result in zip(files, audios, results):
        duration = len(audio) / 16000.0
        share = transcribe_s * duration / max(total_secs, 1e-9)
        if fmt == "json":
            # Key set parity: src/main.rs:1028-1036.
            payload = {
                "text": result.text,
                "language": result.language,
                "duration_ms": result.duration_ms,
                "audio_duration_secs": duration,
                "transcription_time_ms": int(share * 1000),
                "real_time_factor": share / max(duration, 1e-9),
                "model": model,
            }
            if len(files) > 1:
                payload = {"file": path, **payload}
            payloads.append(payload)
        elif fmt in ("srt", "vtt", "timestamped"):
            if len(files) > 1:
                print(f"# {path}")
            segs = [formats.TranscribedSegment(s.start, s.end,
                                               s.text.strip())
                    for s in result.segments]
            print(formats.render(segs, fmt), end="")
        else:
            header = f" {path} " if len(files) > 1 else ""
            print(f"\n---{header or ' Transcription '}---")
            print(result.text)
            print("---")
    if fmt == "json":
        print(json.dumps(payloads[0] if len(payloads) == 1 else payloads,
                         indent=2))
    elif fmt not in ("srt", "vtt", "timestamped"):
        rtf = transcribe_s / max(total_secs, 1e-9)
        print(f"\nTime: {transcribe_s * 1000:.0f}ms (RTF: {rtf:.3f}x)")
    return 0


def _transcribe_batch(engine, audios, args):
    """Concurrent files through the continuous-batching server — the
    batch-file path (baseline config #2) where TPU batching shines.
    Every file runs its own seek loop (one window in flight per file;
    ≤30 s files are single-window loops), and the server batches the
    in-flight windows of different files into one decode step. With
    --beam-size the same path runs concurrent beam GROUPS
    (runtime/beam_server) instead of degrading to one-shot-per-file."""
    from openhush_tpu.runtime import longform

    lang = args.language or engine.language or "auto"
    server = longform.make_server(engine.cfg, engine.params,
                                  engine.tokenizer,
                                  n_files=len(audios),
                                  beam_size=getattr(args, "beam_size",
                                                    None),
                                  dtype=engine.dtype)
    return longform.transcribe_files(
        server, audios, language=lang,
        task="translate" if args.translate else "transcribe")


def cmd_model(args) -> int:
    from openhush_tpu.models.whisper.config import CONFIGS

    if args.model_cmd == "list":
        from openhush_tpu.runtime.engine import default_model_dir
        import os
        print("Available models:")
        for name, cfg in CONFIGS.items():
            if name == "test":
                continue
            path = os.path.join(default_model_dir(), f"{name}.npz")
            status = "downloaded" if os.path.exists(path) else "not converted"
            print(f"  {name:16s} d={cfg.n_audio_state:5d} "
                  f"layers={cfg.n_audio_layer:2d}/{cfg.n_text_layer:<2d} "
                  f"mels={cfg.n_mels:3d}  [{status}]")
        return 0
    if args.model_cmd == "convert":
        return _convert_model(args)
    if args.model_cmd == "convert-m2m100":
        return _convert_m2m100(args)
    if args.model_cmd == "convert-aux":
        return _convert_aux(args)
    if args.model_cmd == "download":
        return _download_model(args)
    if args.model_cmd == "remove":
        return _remove_model(args)
    if args.model_cmd in ("load", "unload"):
        return _model_load_unload(args.model_cmd)
    print(f"unknown model subcommand: {args.model_cmd}", file=sys.stderr)
    return 1


# HF hub file set per model (parity role: the ggml download table at
# src/engine/whisper.rs:427-435 + the Range-resume downloader :456-598;
# here the checkpoint is fetched from openai/whisper-* and converted to
# npz in one step).
_HF_BASE = "https://huggingface.co/openai/whisper-{name}/resolve/main"
_HF_FILES = ("model.safetensors", "config.json", "vocab.json",
             "merges.txt")


def _safe_model_name(name: str) -> bool:
    """Reject names that would escape the model directory (or the
    download URL path) when interpolated: path separators and '..'
    drive unlink/rmtree/URL construction."""
    import os
    if not name or name in (".", ".."):
        return False
    if "/" in name or "\\" in name or os.sep in name or ".." in name:
        return False
    return True


def _download_model(args) -> int:
    import os
    import types

    from openhush_tpu.runtime.engine import default_model_dir
    from openhush_tpu.utils.downloads import download_with_resume

    name = args.name
    if not _safe_model_name(name):
        print(f"invalid model name: {name!r}", file=sys.stderr)
        return 1
    base = (args.base_url or _HF_BASE).format(name=name)
    stage = os.path.join(default_model_dir(), "hf", name)
    os.makedirs(stage, exist_ok=True)
    for fname in _HF_FILES:
        dest = os.path.join(stage, fname)
        if os.path.exists(dest):
            print(f"  {fname}: cached")
            continue
        url = f"{base}/{fname}"
        print(f"  fetching {url}")
        try:
            download_with_resume(url, dest)
        except Exception as e:  # noqa: BLE001
            if fname in ("vocab.json", "merges.txt"):
                print(f"  {fname}: unavailable ({e}); tokenizer falls "
                      f"back to the built-in vocabulary")
                continue
            print(f"download failed: {e}", file=sys.stderr)
            return 1
    rc = _convert_model(types.SimpleNamespace(
        name=name, hf_path=stage, output=None))
    if rc == 0:
        # Keep tokenizer files next to the npz (WhisperTokenizer.for_model
        # picks them up from the model dir).
        import shutil
        for fname in ("vocab.json", "merges.txt"):
            src = os.path.join(stage, fname)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(default_model_dir(), fname))
    return rc


def _remove_model(args) -> int:
    import os
    import shutil

    from openhush_tpu.runtime.engine import default_model_dir

    if not _safe_model_name(args.name):
        print(f"invalid model name: {args.name!r}", file=sys.stderr)
        return 1
    removed = False
    npz = os.path.join(default_model_dir(), f"{args.name}.npz")
    if os.path.exists(npz):
        os.unlink(npz)
        removed = True
        print(f"Removed {npz}")
    stage = os.path.join(default_model_dir(), "hf", args.name)
    if os.path.isdir(stage):
        shutil.rmtree(stage)
        removed = True
        print(f"Removed {stage}")
    if not removed:
        print(f"Nothing to remove for {args.name}")
    return 0


def _model_load_unload(which: str) -> int:
    """Ask the running daemon to load/unload the engine (parity:
    ModelAction::Load/Unload over D-Bus, src/main.rs:1079-1120; our
    engine server keeps the model resident so this is an ack)."""
    member = "LoadModel" if which == "load" else "UnloadModel"
    try:
        from openhush_tpu.utils.dbus import DbusClient
        client = DbusClient()
        ok = client.call(member)
        client.close()
    except Exception:  # noqa: BLE001 — no session bus → IPC fallback
        try:
            from openhush_tpu.runtime import ipc
            ok = ipc.IpcClient().send(
                "load_model" if which == "load" else "unload_model"
            ).get("ok", False)
        except (ConnectionError, OSError):
            print("Daemon not running", file=sys.stderr)
            return 1
    print("ok" if ok else "failed")
    return 0 if ok else 1


AUX_KINDS = ("silero", "rnnoise", "wakeword-embedding",
             "wakeword-classifier", "wespeaker", "segmentation")


def _convert_aux(args) -> int:
    """Convert an auxiliary-model checkpoint for TPU-side execution.

    Parity targets: Silero VAD (src/vad/silero.rs:54), RNNoise weights
    (src/input/audio.rs:293), openWakeWord's ONNX stages
    (src/input/wake_word.rs:121-146), wespeaker embedding + pyannote
    segmentation (src/diarization/mod.rs:266-299).

    - silero:   torch-jit checkpoint → native JAX params npz
                (.onnx inputs run through the generic importer instead)
    - rnnoise:  published text model file → exact-topology npz
    - wakeword-embedding / wakeword-classifier / wespeaker /
      segmentation: .onnx graphs — parsed, op-coverage-validated,
      dry-run on zeros when input shapes are static, then installed
      for the ONNX→JAX importer to execute at load time.
    """
    import os

    from openhush_tpu.runtime.engine import default_model_dir

    which, path = args.which, args.path
    aux_dir = os.path.join(default_model_dir(), "aux")
    os.makedirs(aux_dir, exist_ok=True)

    if which == "silero":
        from openhush_tpu.models import silero
        if path.endswith(".onnx"):
            return _install_onnx(path, args.output
                                 or os.path.join(aux_dir, "silero.onnx"))
        params = silero.convert_jit(path)
        out = args.output or os.path.join(aux_dir, "silero.npz")
        silero.save_npz(params, out, pad_mode=args.stft_pad)
        print(f"Converted Silero VAD → {out} (stft pad: {args.stft_pad}; "
              f"validate with tools/validate_aux.py against the source "
              f"checkpoint)")
        return 0

    if which == "rnnoise":
        from openhush_tpu.ops import rnnoise_model
        params = rnnoise_model.load(path)
        out = args.output or os.path.join(aux_dir, "rnnoise.npz")
        rnnoise_model.save_npz(params, out)
        dims = {k: tuple(int(x) for x in
                         (params[k].get("w", params[k].get("wx")).shape))
                for k in params}
        print(f"Converted RNNoise model → {out}  layers: {dims}")
        return 0

    if which in AUX_KINDS:
        default_name = {"wakeword-embedding": "wakeword_embedding.onnx",
                        "wakeword-classifier": "wakeword_classifier.onnx",
                        "wespeaker": "wespeaker.onnx",
                        "segmentation": "segmentation.onnx"}[which]
        return _install_onnx(path, args.output
                             or os.path.join(aux_dir, default_name))

    print(f"unknown aux model kind: {which} (expected one of "
          f"{', '.join(AUX_KINDS)})", file=sys.stderr)
    return 1


def _install_onnx(path: str, out: str) -> int:
    """Validate an .onnx file against the JAX importer, then install it."""
    import os
    import shutil

    import numpy as np

    from openhush_tpu.models.onnx2jax import OnnxJaxModel, UnsupportedOnnxOp

    model = OnnxJaxModel.load(path)
    ops = sorted({n.op_type for n in model.model.graph.nodes})
    print(f"Parsed {os.path.basename(path)}: "
          f"{len(model.model.graph.nodes)} nodes, ops: {', '.join(ops)}")
    # Dry-run on zeros when every input shape is static.
    init_names = set(model.model.graph.initializers)
    shapes = []
    static = True
    for vi in model.model.graph.inputs:
        if vi.name in init_names:
            continue
        if not vi.shape or any(not isinstance(d, int) or d <= 0
                               for d in vi.shape):
            static = False
            break
        shapes.append(vi.shape)
    if static:
        try:
            outs = model(*[np.zeros(s, np.float32) for s in shapes])
            outs = outs if isinstance(outs, tuple) else (outs,)
            print("Dry-run OK, outputs: "
                  + ", ".join(str(tuple(np.asarray(o).shape))
                              for o in outs))
        except UnsupportedOnnxOp as exc:
            print(f"ERROR: graph uses unsupported ops: {exc}",
                  file=sys.stderr)
            return 1
    else:
        print("(symbolic input shapes — skipping dry-run; the importer "
              "validates at first call)")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.abspath(path) != os.path.abspath(out):
        shutil.copyfile(path, out)
    print(f"Installed → {out}")
    return 0


def _convert_m2m100(args) -> int:
    import os

    from openhush_tpu.models import m2m100
    from openhush_tpu.models.whisper.convert import save_npz
    from openhush_tpu.runtime.engine import default_model_dir

    hf = args.hf_path
    bin_path = os.path.join(hf, "pytorch_model.bin")
    st_path = os.path.join(hf, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file  # type: ignore
        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    else:
        print(f"No checkpoint found under {hf}", file=sys.stderr)
        return 1
    cfg = m2m100.CONFIGS.get(args.name, m2m100.CONFIGS["418M"])
    params = m2m100.from_hf_state_dict(sd, cfg)
    out = args.output or os.path.join(default_model_dir(), "m2m100.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_npz(params, out)
    print(f"Converted M2M-100 {cfg.name} → {out}")
    return 0


def _convert_model(args) -> int:
    """Convert a local HF Whisper checkpoint directory to our npz format."""
    import os

    from openhush_tpu.models.whisper.config import get_config
    from openhush_tpu.models.whisper.convert import (from_hf_state_dict,
                                                     save_npz)
    from openhush_tpu.runtime.engine import default_model_dir

    cfg = get_config(args.name)
    sd = None
    hf = args.hf_path
    st_path = os.path.join(hf, "model.safetensors")
    bin_path = os.path.join(hf, "pytorch_model.bin")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file  # type: ignore
        sd = load_file(st_path)
    elif os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    else:
        print(f"No checkpoint found under {hf}", file=sys.stderr)
        return 1
    params = from_hf_state_dict(sd, cfg)
    out = args.output or os.path.join(default_model_dir(),
                                      f"{args.name}.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_npz(params, out)
    print(f"Converted {args.name} → {out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    from openhush_tpu import __version__
    p = argparse.ArgumentParser(
        prog="openhush",
        description="Local voice-to-text (TPU-native rebuild)")
    p.add_argument("--version", action="version",
                   version=f"openhush-tpu {__version__}")
    p.add_argument("--verbose", "-v", action="count", default=0)
    sub = p.add_subparsers(dest="command")

    _add_transcribe(sub)

    pm = sub.add_parser("model", help="Manage models")
    pm_sub = pm.add_subparsers(dest="model_cmd")
    pm_sub.add_parser("list", help="List models")
    pd = pm_sub.add_parser(
        "download", help="Download a HF Whisper checkpoint and convert "
                         "it to npz (Range-resumable)")
    pd.add_argument("name")
    pd.add_argument("--base-url", default=None,
                    help="override the HF URL template (mirrors/tests)")
    pr = pm_sub.add_parser("remove", help="Remove a downloaded model")
    pr.add_argument("name")
    pm_sub.add_parser("load", help="Load model (running daemon)")
    pm_sub.add_parser("unload", help="Unload model (running daemon)")
    pc = pm_sub.add_parser("convert",
                           help="Convert a HF Whisper checkpoint to npz")
    pc.add_argument("name")
    pc.add_argument("--hf-path", required=True)
    pc.add_argument("--output", default=None)
    pc2 = pm_sub.add_parser("convert-m2m100",
                            help="Convert a HF M2M-100 checkpoint to npz")
    pc2.add_argument("name", nargs="?", default="418M")
    pc2.add_argument("--hf-path", required=True)
    pc2.add_argument("--output", default=None)
    pc3 = pm_sub.add_parser(
        "convert-aux",
        help="Convert an aux model (silero/rnnoise/wakeword-*/wespeaker/"
             "segmentation)")
    pc3.add_argument("which", choices=list(AUX_KINDS))
    pc3.add_argument("path")
    pc3.add_argument("--output", default=None)
    pc3.add_argument("--stft-pad", choices=["left", "right", "both"],
                     default="left",
                     help="Silero STFT reflect-pad variant (see "
                          "tools/validate_aux.py)")

    for name, helptext in [
            ("start", "Start the daemon"),
            ("stop", "Stop the daemon"),
            ("status", "Show daemon status"),
            ("record", "Record and transcribe long-form audio"),
            ("recording", "Control recording (start/stop/toggle)"),
            ("config", "Get/set configuration"),
            ("device", "List/select audio devices"),
            ("service", "Manage autostart service"),
            ("secret", "Manage secrets"),
            ("api-key", "Manage API keys"),
            ("summarize", "Summarize a transcript"),
            ("evaluate", "Evaluate WER on a LibriSpeech-layout dataset"),
            ("preferences", "Open preferences"),
            ("setup", "First-run setup wizard")]:
        sub.add_parser(name, help=helptext, add_help=False,
                       prefix_chars="\x00").add_argument(
            "args", nargs=argparse.REMAINDER)
    return p


def main(argv=None) -> int:
    # Crash hook first (parity: panic handler installed before anything
    # else, src/main.rs:416), then logging by OPENHUSH_LOG > -v > config.
    from openhush_tpu.utils import crash, tracing
    crash.install()
    args = build_parser().parse_args(argv)
    try:
        from openhush_tpu.utils.config import Config
        level = Config.load_or_default().logging.level
    except Exception:  # noqa: BLE001
        level = "info"
    tracing.setup_logging(verbose=args.verbose, config_level=level)
    if args.command == "transcribe":
        return cmd_transcribe(args)
    if args.command == "model":
        return cmd_model(args)
    if args.command is None:
        build_parser().print_help()
        return 0
    # Commands wired in later milestones dispatch through the daemon module.
    from openhush_tpu.runtime import daemon_cli
    return daemon_cli.dispatch(args.command, getattr(args, "args", []))


def run() -> int:
    """Entry point with Unix-pipe hygiene: `openhush status | head` must
    exit quietly (SIGPIPE convention, exit 141), not crash-report."""
    try:
        return main()
    except BrokenPipeError:
        try:
            sys.stdout.close()
        except Exception:  # noqa: BLE001
            pass
        return 141


if __name__ == "__main__":
    sys.exit(run())
