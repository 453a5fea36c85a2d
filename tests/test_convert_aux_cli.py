"""`openhush model convert-aux` end-to-end: synthetic checkpoints for each
aux model kind are converted through the real CLI entry point and then
loaded by the consuming engines (VAD factory, wake-word detector,
diarization embedder) — the full path a user takes on a networked machine
with real published checkpoints.
"""

import numpy as np
import pytest

from openhush_tpu import cli
from openhush_tpu.models.onnx2jax import OnnxJaxModel
from openhush_tpu.utils import onnx_io
from openhush_tpu.utils.onnx_io import (OnnxGraph, OnnxModel, OnnxNode,
                                        OnnxValueInfo)

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(9)


def run_cli(*argv) -> int:
    return cli.main(list(argv))


# ---------------------------------------------------------------------------
# silero (torch-jit path)
# ---------------------------------------------------------------------------

def _make_silero_jit(tmp_path) -> str:
    from tests.test_aux_convert import SileroReplica
    torch.manual_seed(1)
    path = str(tmp_path / "silero_vad.jit")
    torch.jit.save(torch.jit.script(SileroReplica().eval()), path)
    return path


def test_convert_aux_silero_and_factory(tmp_path):
    jit_path = _make_silero_jit(tmp_path)
    out = str(tmp_path / "silero.npz")
    assert run_cli("model", "convert-aux", "silero", jit_path,
                   "--output", out) == 0

    from openhush_tpu.models import vad as vad_mod

    class Cfg:
        engine = "silero"
        threshold = 0.5
        model_path = out

    engine = vad_mod.create_engine(Cfg())
    assert type(engine).__name__ == "SileroVad"
    res = engine.process(RNG.standard_normal(512).astype(np.float32))
    assert 0.0 <= res.probability <= 1.0


def test_factory_falls_back_to_energy_on_missing_model():
    from openhush_tpu.models import vad as vad_mod

    class Cfg:
        engine = "silero"
        threshold = 0.5
        model_path = "/nonexistent/silero.npz"

    engine = vad_mod.create_engine(Cfg())
    assert isinstance(engine, vad_mod.VadEngine)
    assert engine.kind == "energy"


# ---------------------------------------------------------------------------
# rnnoise
# ---------------------------------------------------------------------------

def test_convert_aux_rnnoise(tmp_path):
    from tests.test_aux_convert import _build_model_text
    text, _ = _build_model_text(np.random.default_rng(4))
    src = tmp_path / "orig.rnnn"
    src.write_text(text)
    out = str(tmp_path / "rnnoise.npz")
    assert run_cli("model", "convert-aux", "rnnoise", str(src),
                   "--output", out) == 0
    from openhush_tpu.ops import rnnoise_model
    params = rnnoise_model.load_npz(out)
    state = rnnoise_model.init_rnn_state(params)
    state, gains, vad = rnnoise_model.rnn_step(
        params, state, np.zeros(42, np.float32))
    assert np.asarray(gains).shape == (22,)


# ---------------------------------------------------------------------------
# openWakeWord ONNX stages
# ---------------------------------------------------------------------------

def _wakeword_embedding_onnx(tmp_path) -> str:
    """[1,76,32,1] mel image → [1,1,1,96] embedding (conv + pool)."""
    w = (RNG.standard_normal((96, 1, 8, 8)) * 0.05).astype(np.float32)
    nodes = [
        OnnxNode("Transpose", ["x"], ["xt"], attrs={"perm": [0, 3, 1, 2]}),
        OnnxNode("Conv", ["xt", "w"], ["h"],
                 attrs={"strides": [4, 4], "kernel_shape": [8, 8]}),
        OnnxNode("Relu", ["h"], ["hr"]),
        OnnxNode("GlobalAveragePool", ["hr"], ["g"]),      # [1,96,1,1]
        OnnxNode("Transpose", ["g"], ["y"], attrs={"perm": [0, 2, 3, 1]}),
    ]
    g = OnnxGraph(nodes, {"w": w},
                  [OnnxValueInfo("x", 1, (1, 76, 32, 1))],
                  [OnnxValueInfo("y", 1, (1, 1, 1, 96))])
    path = str(tmp_path / "embedding_model.onnx")
    onnx_io.save(OnnxModel(g), path)
    return path


def _wakeword_classifier_onnx(tmp_path) -> str:
    """[1,16,96] embedding window → [1,1] score."""
    w1 = (RNG.standard_normal((16 * 96, 32)) * 0.02).astype(np.float32)
    w2 = (RNG.standard_normal((32, 1)) * 0.1).astype(np.float32)
    nodes = [
        OnnxNode("Flatten", ["x"], ["xf"], attrs={"axis": 1}),
        OnnxNode("MatMul", ["xf", "w1"], ["h"]),
        OnnxNode("Relu", ["h"], ["hr"]),
        OnnxNode("MatMul", ["hr", "w2"], ["s"]),
        OnnxNode("Sigmoid", ["s"], ["y"]),
    ]
    g = OnnxGraph(nodes, {"w1": w1, "w2": w2},
                  [OnnxValueInfo("x", 1, (1, 16, 96))],
                  [OnnxValueInfo("y", 1, (1, 1))])
    path = str(tmp_path / "hey_jarvis.onnx")
    onnx_io.save(OnnxModel(g), path)
    return path


def test_convert_aux_wakeword_pipeline(tmp_path):
    emb_src = _wakeword_embedding_onnx(tmp_path)
    cls_src = _wakeword_classifier_onnx(tmp_path)
    emb_out = str(tmp_path / "installed_emb.onnx")
    cls_out = str(tmp_path / "installed_cls.onnx")
    assert run_cli("model", "convert-aux", "wakeword-embedding", emb_src,
                   "--output", emb_out) == 0
    assert run_cli("model", "convert-aux", "wakeword-classifier", cls_src,
                   "--output", cls_out) == 0

    from openhush_tpu.models.wakeword import WakeWordDetector
    det = WakeWordDetector.from_onnx(emb_out, cls_out)
    score = None
    # 76 mel frames need ceil(76/8)+ chunks to warm up, then 16 embeddings
    for _ in range(30):
        chunk = (RNG.standard_normal(det.chunk_size) * 0.1).astype(
            np.float32)
        score = det.process(chunk)
    assert score is not None and 0.0 <= score <= 1.0


# ---------------------------------------------------------------------------
# wespeaker embedder ONNX
# ---------------------------------------------------------------------------

def _wespeaker_onnx(tmp_path) -> str:
    """[1,T,80] fbank → [1,64] embedding (mean-pool + projection);
    symbolic time dim like real wespeaker exports."""
    w = (RNG.standard_normal((80, 64)) * 0.1).astype(np.float32)
    nodes = [
        OnnxNode("ReduceMean", ["x"], ["m"], attrs={"axes": [1],
                                                    "keepdims": 0}),
        OnnxNode("MatMul", ["m", "w"], ["y"]),
    ]
    g = OnnxGraph(nodes, {"w": w},
                  [OnnxValueInfo("x", 1, (1, "T", 80))],
                  [OnnxValueInfo("y", 1, (1, 64))])
    path = str(tmp_path / "wespeaker.onnx")
    onnx_io.save(OnnxModel(g), path)
    return path


def test_convert_aux_wespeaker_and_diarization(tmp_path):
    src = _wespeaker_onnx(tmp_path)
    out = str(tmp_path / "wespeaker_installed.onnx")
    assert run_cli("model", "convert-aux", "wespeaker", src,
                   "--output", out) == 0

    from openhush_tpu.models.diarization import DiarizationEngine
    eng = DiarizationEngine.from_onnx(out)
    t = np.arange(16000) / 16000.0
    voice_a = np.sin(2 * np.pi * 120 * t).astype(np.float32)
    voice_b = np.sign(np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    ea, eb = eng.embed(voice_a), eng.embed(voice_b)
    assert ea.shape == (64,) and eb.shape == (64,)
    np.testing.assert_allclose(np.linalg.norm(ea), 1.0, rtol=1e-5)
    assert not np.allclose(ea, eb)


# ---------------------------------------------------------------------------
# silero ONNX path (generic importer, stateful signature)
# ---------------------------------------------------------------------------

def _silero_like_onnx(tmp_path) -> str:
    """(input [1,512], state [2,1,128]) → (prob [1,1], state) with the
    v5-style recurrent-state signature."""
    w = (RNG.standard_normal((512, 128)) * 0.01).astype(np.float32)
    wo = (RNG.standard_normal((128, 1)) * 0.1).astype(np.float32)
    nodes = [
        OnnxNode("MatMul", ["input", "w"], ["f"]),
        OnnxNode("Tanh", ["f"], ["ft"]),
        OnnxNode("Split", ["state"], ["h", "c"], attrs={"axis": 0}),
        OnnxNode("Squeeze", ["h"], ["h0"], attrs={"axes": [0]}),
        OnnxNode("Add", ["ft", "h0"], ["h1"]),
        OnnxNode("Tanh", ["h1"], ["h2"]),
        OnnxNode("MatMul", ["h2", "wo"], ["logit"]),
        OnnxNode("Sigmoid", ["logit"], ["prob"]),
        OnnxNode("Unsqueeze", ["h2"], ["hn"], attrs={"axes": [0]}),
        OnnxNode("Concat", ["hn", "c"], ["staten"], attrs={"axis": 0}),
    ]
    g = OnnxGraph(nodes, {"w": w, "wo": wo},
                  [OnnxValueInfo("input", 1, (1, 512)),
                   OnnxValueInfo("state", 1, (2, 1, 128))],
                  [OnnxValueInfo("prob", 1, (1, 1)),
                   OnnxValueInfo("staten", 1, (2, 1, 128))])
    path = str(tmp_path / "silero.onnx")
    onnx_io.save(OnnxModel(g), path)
    return path


def test_onnx_silero_vad_threads_state(tmp_path):
    path = _silero_like_onnx(tmp_path)
    from openhush_tpu.models.vad import OnnxSileroVad
    vad = OnnxSileroVad(path)
    chunk = (RNG.standard_normal(512) * 0.1).astype(np.float32)
    p1 = vad.process(chunk).probability
    p2 = vad.process(chunk).probability     # state advanced → different
    assert p1 != p2
    vad.reset()
    assert vad.process(chunk).probability == pytest.approx(p1)


def test_convert_aux_rejects_unsupported_graph(tmp_path, capsys):
    node = OnnxNode("NonMaxSuppression", ["x"], ["y"])
    g = OnnxGraph([node], {}, [OnnxValueInfo("x", 1, (1, 4))],
                  [OnnxValueInfo("y", 1, (1,))])
    path = str(tmp_path / "bad.onnx")
    onnx_io.save(OnnxModel(g), path)
    assert run_cli("model", "convert-aux", "segmentation", path,
                   "--output", str(tmp_path / "out.onnx")) == 1
