#!/usr/bin/env python3
"""Validate converted aux models against their source checkpoints.

Run on a machine that has the real published checkpoints (this repo's CI
environment is air-gapped; see docs/RUNBOOK.md). For each aux model it
executes source and conversion side by side on random audio/features and
reports max divergence. For Silero it additionally sweeps the STFT
reflect-pad variants and rewrites the npz with whichever matches the
source — settling the one documented export ambiguity.

Usage:
  python tools/validate_aux.py silero   silero_vad.jit   converted.npz
  python tools/validate_aux.py onnx     model.onnx       [atol]
  python tools/validate_aux.py rnnoise  model.rnnn       converted.npz
"""

import sys

import numpy as np


def validate_silero(jit_path: str, npz_path: str) -> int:
    import torch

    from openhush_tpu.models import silero

    model = torch.jit.load(jit_path, map_location="cpu").eval()
    params, _ = silero.load_npz(npz_path)
    rng = np.random.default_rng(0)
    chunks = [rng.standard_normal(512).astype(np.float32) * 0.1
              for _ in range(20)]

    # Reference probabilities from the real checkpoint
    ref = []
    try:
        model.reset_states()
    except Exception:  # noqa: BLE001
        pass
    # Real checkpoints are stateful `forward(x, sr)`; the synthetic
    # replica (tests/test_aux_convert.SileroReplica, used by the
    # offline gate dry-run) is the stateless (chunk, h, c, context)
    # export. Drive whichever signature the jit has.
    stateful = True
    try:
        with torch.no_grad():
            out = model(torch.from_numpy(chunks[0])[None], 16000)
        ref.append(float(np.asarray(out).reshape(-1)[0]))
        rest = chunks[1:]
    except RuntimeError:
        stateful = False
        h = torch.zeros(1, 128)
        cst = torch.zeros(1, 128)
        ctx = torch.zeros(1, 64)
        rest = chunks
    for c in rest:
        with torch.no_grad():
            if stateful:
                out = model(torch.from_numpy(c)[None], 16000)
            else:
                out, h, cst, ctx = model(torch.from_numpy(c)[None], h,
                                         cst, ctx)
        ref.append(float(np.asarray(out).reshape(-1)[0]))

    best = None
    for pad_mode in silero.PAD_MODES:
        state = silero.init_state()
        errs = []
        for c, r in zip(chunks, ref):
            state, p = silero.forward_chunk(params, state, c,
                                            pad_mode=pad_mode)
            errs.append(abs(float(p) - r))
        worst = max(errs)
        print(f"  pad_mode={pad_mode:5s}  max|Δprob| = {worst:.2e}")
        if best is None or worst < best[1]:
            best = (pad_mode, worst)

    pad_mode, worst = best
    if worst < 1e-3:
        silero.save_npz(params, npz_path, pad_mode=pad_mode)
        print(f"PASS: pad_mode={pad_mode} matches the checkpoint "
              f"(max {worst:.2e}); npz updated")
        return 0
    print(f"FAIL: best variant {pad_mode} still diverges ({worst:.2e}) — "
          f"the checkpoint's graph differs from models/silero.py; run the "
          f".onnx through `model convert-aux silero file.onnx` instead "
          f"(generic importer executes the actual graph)")
    return 1


def validate_onnx(path: str, atol: float = 1e-3) -> int:
    """Cross-check the JAX importer against onnxruntime on random input."""
    from openhush_tpu.models.onnx2jax import OnnxJaxModel
    try:
        import onnxruntime as ort
    except ImportError:
        print("onnxruntime not installed — pip install onnxruntime")
        return 2
    m = OnnxJaxModel.load(path)
    sess = ort.InferenceSession(path, providers=["CPUExecutionProvider"])
    rng = np.random.default_rng(0)
    feeds = {}
    args = []
    for inp in sess.get_inputs():
        shape = [d if isinstance(d, int) else 100 for d in inp.shape]
        x = rng.standard_normal(shape).astype(np.float32)
        if "int" in inp.type:
            x = np.asarray(np.prod(shape) * 0 + 16000, np.int64)
        feeds[inp.name] = x
        args.append(x)
    ref = sess.run(None, feeds)
    ours = m(*args)
    ours = ours if isinstance(ours, tuple) else (ours,)
    ok = True
    for i, (r, o) in enumerate(zip(ref, ours)):
        err = float(np.max(np.abs(np.asarray(r) - np.asarray(o))))
        print(f"  output {i}: max|Δ| = {err:.2e}")
        ok &= err <= atol
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def validate_rnnoise(rnnn_path: str, npz_path: str) -> int:
    from openhush_tpu.ops import rnnoise_model
    src = rnnoise_model.load(rnnn_path)
    dst = rnnoise_model.load_npz(npz_path)
    rng = np.random.default_rng(0)
    s1 = rnnoise_model.init_rnn_state(src)
    s2 = rnnoise_model.init_rnn_state(dst)
    worst = 0.0
    for _ in range(50):
        f = rng.standard_normal(42).astype(np.float32)
        s1, g1, v1 = rnnoise_model.rnn_step(src, s1, f)
        s2, g2, v2 = rnnoise_model.rnn_step(dst, s2, f)
        worst = max(worst, float(np.max(np.abs(np.asarray(g1)
                                               - np.asarray(g2)))))
    print(f"max|Δgain| over 50 frames: {worst:.2e}")
    print("PASS" if worst < 1e-5 else "FAIL")
    return 0 if worst < 1e-5 else 1


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    kind = sys.argv[1]
    if kind == "silero":
        return validate_silero(sys.argv[2], sys.argv[3])
    if kind == "onnx":
        atol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-3
        return validate_onnx(sys.argv[2], atol)
    if kind == "rnnoise":
        return validate_rnnoise(sys.argv[2], sys.argv[3])
    print(f"unknown kind {kind}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
