"""ONNX reader/writer + ONNX→JAX importer tests.

Synthetic .onnx files are built with the pure-Python writer
(utils/onnx_io.py) and executed with the JAX importer
(models/onnx2jax.py); numerics are checked against torch (the de-facto
reference for Conv/LSTM/GRU semantics, and what exported the real aux
checkpoints in the first place) and numpy. This is the offline guarantee
behind `openhush model convert-aux`: if the op-set semantics match torch
here, real published checkpoints (Silero VAD, openWakeWord, wespeaker,
pyannote segmentation — reference: src/vad/silero.rs:54,
src/input/wake_word.rs:121-146, src/diarization/mod.rs:266-299) evaluate
correctly first-try on a networked machine.
"""

import numpy as np
import pytest

from openhush_tpu.models.onnx2jax import OnnxJaxModel, UnsupportedOnnxOp
from openhush_tpu.utils import onnx_io
from openhush_tpu.utils.onnx_io import (OnnxGraph, OnnxModel, OnnxNode,
                                        OnnxValueInfo)

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(0)


def make_model(nodes, initializers, inputs, outputs):
    graph = OnnxGraph(nodes=nodes, initializers=initializers,
                      inputs=[OnnxValueInfo(n, 1, s) for n, s in inputs],
                      outputs=[OnnxValueInfo(n, 1, s) for n, s in outputs])
    return OnnxModel(graph)


def roundtrip(model: OnnxModel, tmp_path) -> OnnxJaxModel:
    """Always exercise the serialize→parse path, like a real file."""
    p = str(tmp_path / "m.onnx")
    onnx_io.save(model, p)
    return OnnxJaxModel.load(p)


# ---------------------------------------------------------------------------
# Wire format round-trip
# ---------------------------------------------------------------------------

def test_roundtrip_preserves_structure(tmp_path):
    w = RNG.standard_normal((4, 3)).astype(np.float32)
    node = OnnxNode("Gemm", ["x", "w"], ["y"], name="gemm0",
                    attrs={"transB": 1, "alpha": 1.0})
    model = make_model([node], {"w": w}, [("x", (2, 3))], [("y", (2, 4))])
    p = str(tmp_path / "m.onnx")
    onnx_io.save(model, p)
    back = onnx_io.load(p)
    assert back.graph.nodes[0].op_type == "Gemm"
    assert back.graph.nodes[0].attrs["transB"] == 1
    assert back.graph.nodes[0].attrs["alpha"] == pytest.approx(1.0)
    np.testing.assert_array_equal(back.graph.initializers["w"], w)
    assert back.graph.inputs[0].name == "x"
    assert back.graph.inputs[0].shape == (2, 3)
    assert back.opset == model.opset


def test_roundtrip_int64_and_attr_kinds(tmp_path):
    idx = np.asarray([2, 0, 1], np.int64)
    node = OnnxNode("Gather", ["x", "i"], ["y"], attrs={"axis": 0})
    model = make_model([node], {"i": idx}, [("x", (3, 2))], [("y", (3, 2))])
    m = roundtrip(model, tmp_path)
    x = RNG.standard_normal((3, 2)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m(x)), x[[2, 0, 1]])


# ---------------------------------------------------------------------------
# Conv / pool / norm vs torch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,pad,dil,groups", [
    (1, 0, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2),
])
def test_conv1d_matches_torch(tmp_path, stride, pad, dil, groups):
    x = RNG.standard_normal((2, 4, 37)).astype(np.float32)
    w = RNG.standard_normal((6, 4 // groups, 5)).astype(np.float32)
    b = RNG.standard_normal(6).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=stride, padding=pad, dilation=dil, groups=groups).numpy()
    node = OnnxNode("Conv", ["x", "w", "b"], ["y"], attrs={
        "strides": [stride], "pads": [pad, pad], "dilations": [dil],
        "group": groups, "kernel_shape": [5]})
    m = roundtrip(make_model([node], {"w": w, "b": b},
                             [("x", x.shape)], [("y", ref.shape)]), tmp_path)
    np.testing.assert_allclose(np.asarray(m(x)), ref, rtol=2e-5, atol=2e-5)


def test_conv2d_same_upper_matches_torch(tmp_path):
    x = RNG.standard_normal((1, 3, 16, 16)).astype(np.float32)
    w = RNG.standard_normal((8, 3, 3, 3)).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    node = OnnxNode("Conv", ["x", "w"], ["y"], attrs={
        "auto_pad": "SAME_UPPER", "kernel_shape": [3, 3]})
    m = roundtrip(make_model([node], {"w": w},
                             [("x", x.shape)], [("y", ref.shape)]), tmp_path)
    np.testing.assert_allclose(np.asarray(m(x)), ref, rtol=2e-5, atol=2e-5)


def test_pools_match_torch(tmp_path):
    x = RNG.standard_normal((2, 3, 21)).astype(np.float32)
    ref_max = torch.nn.functional.max_pool1d(
        torch.from_numpy(x), 3, stride=2, padding=1).numpy()
    ref_avg = torch.nn.functional.avg_pool1d(
        torch.from_numpy(x), 3, stride=2, padding=1,
        count_include_pad=False).numpy()
    for op, ref in [("MaxPool", ref_max), ("AveragePool", ref_avg)]:
        node = OnnxNode(op, ["x"], ["y"], attrs={
            "kernel_shape": [3], "strides": [2], "pads": [1, 1]})
        m = roundtrip(make_model([node], {}, [("x", x.shape)],
                                 [("y", ref.shape)]), tmp_path)
        np.testing.assert_allclose(np.asarray(m(x)), ref,
                                   rtol=1e-5, atol=1e-5)


def test_batchnorm_matches_torch(tmp_path):
    x = RNG.standard_normal((2, 5, 9)).astype(np.float32)
    scale = RNG.standard_normal(5).astype(np.float32)
    bias = RNG.standard_normal(5).astype(np.float32)
    mean = RNG.standard_normal(5).astype(np.float32)
    var = RNG.random(5).astype(np.float32) + 0.5
    ref = torch.nn.functional.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5).numpy()
    node = OnnxNode("BatchNormalization", ["x", "s", "b", "m", "v"], ["y"],
                    attrs={"epsilon": 1e-5})
    m = roundtrip(make_model([node], {"s": scale, "b": bias, "m": mean,
                                      "v": var},
                             [("x", x.shape)], [("y", x.shape)]), tmp_path)
    np.testing.assert_allclose(np.asarray(m(x)), ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Recurrent ops vs torch (the heart of Silero/pyannote import)
# ---------------------------------------------------------------------------

def torch_lstm_to_onnx(lstm: "torch.nn.LSTM", layer=0, reverse=False):
    """torch gate order (i,f,g,o) → ONNX (i,o,f,c), [D,4H,*] layout."""
    sfx = "_reverse" if reverse else ""
    wi = getattr(lstm, f"weight_ih_l{layer}{sfx}").detach().numpy()
    wh = getattr(lstm, f"weight_hh_l{layer}{sfx}").detach().numpy()
    bi = getattr(lstm, f"bias_ih_l{layer}{sfx}").detach().numpy()
    bh = getattr(lstm, f"bias_hh_l{layer}{sfx}").detach().numpy()
    H = wh.shape[1]

    def reorder(a):
        i, f, g, o = (a[k * H:(k + 1) * H] for k in range(4))
        return np.concatenate([i, o, f, g], axis=0)

    W = reorder(wi)[None]
    R = reorder(wh)[None]
    B = np.concatenate([reorder(bi), reorder(bh)])[None]
    return W.astype(np.float32), R.astype(np.float32), B.astype(np.float32)


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(tmp_path, bidirectional):
    T, B, I, H = 7, 2, 5, 4
    lstm = torch.nn.LSTM(I, H, bidirectional=bidirectional)
    x = RNG.standard_normal((T, B, I)).astype(np.float32)
    with torch.no_grad():
        ref_y, (ref_h, ref_c) = lstm(torch.from_numpy(x))
    Wf, Rf, Bf = torch_lstm_to_onnx(lstm)
    if bidirectional:
        Wr, Rr, Br = torch_lstm_to_onnx(lstm, reverse=True)
        W = np.concatenate([Wf, Wr])
        R = np.concatenate([Rf, Rr])
        Bias = np.concatenate([Bf, Br])
        direction = "bidirectional"
    else:
        W, R, Bias, direction = Wf, Rf, Bf, "forward"
    node = OnnxNode("LSTM", ["x", "W", "R", "B"], ["Y", "Yh", "Yc"],
                    attrs={"direction": direction, "hidden_size": H})
    m = roundtrip(make_model(
        [node], {"W": W, "R": R, "B": Bias}, [("x", (T, B, I))],
        [("Y", ()), ("Yh", ()), ("Yc", ())]), tmp_path)
    Y, Yh, Yc = m(x)
    D = 2 if bidirectional else 1
    # ONNX Y is [T, D, B, H]; torch is [T, B, D*H]
    y_onnx = np.asarray(Y).transpose(0, 2, 1, 3).reshape(T, B, D * H)
    np.testing.assert_allclose(y_onnx, ref_y.numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Yh), ref_h.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Yc), ref_c.numpy(),
                               rtol=2e-5, atol=2e-5)


def torch_gru_to_onnx(gru: "torch.nn.GRU"):
    """torch gate order (r,z,n) → ONNX (z,r,h)."""
    wi = gru.weight_ih_l0.detach().numpy()
    wh = gru.weight_hh_l0.detach().numpy()
    bi = gru.bias_ih_l0.detach().numpy()
    bh = gru.bias_hh_l0.detach().numpy()
    H = wh.shape[1]

    def reorder(a):
        r, z, n = (a[k * H:(k + 1) * H] for k in range(3))
        return np.concatenate([z, r, n], axis=0)

    W = reorder(wi)[None].astype(np.float32)
    R = reorder(wh)[None].astype(np.float32)
    B = np.concatenate([reorder(bi), reorder(bh)])[None].astype(np.float32)
    return W, R, B


def test_gru_matches_torch(tmp_path):
    T, B, I, H = 6, 3, 4, 5
    gru = torch.nn.GRU(I, H)
    x = RNG.standard_normal((T, B, I)).astype(np.float32)
    with torch.no_grad():
        ref_y, ref_h = gru(torch.from_numpy(x))
    W, R, Bias = torch_gru_to_onnx(gru)
    # torch GRU applies the recurrent bias inside the reset gate —
    # ONNX linear_before_reset=1 semantics.
    node = OnnxNode("GRU", ["x", "W", "R", "B"], ["Y", "Yh"],
                    attrs={"hidden_size": H, "linear_before_reset": 1})
    m = roundtrip(make_model(
        [node], {"W": W, "R": R, "B": Bias}, [("x", (T, B, I))],
        [("Y", ()), ("Yh", ())]), tmp_path)
    Y, Yh = m(x)
    np.testing.assert_allclose(np.asarray(Y)[:, 0], ref_y.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(Yh), ref_h.numpy(),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Shape-math folding, jit, control flow, errors
# ---------------------------------------------------------------------------

def test_shape_chain_folds_static_under_jit(tmp_path):
    """Shape→Gather→Concat→Reshape chains (ubiquitous in exports) must
    fold to static shapes so the traced XLA graph compiles."""
    nodes = [
        OnnxNode("Shape", ["x"], ["shp"]),
        OnnxNode("Gather", ["shp", "zero"], ["n"], attrs={"axis": 0}),
        OnnxNode("Unsqueeze", ["n"], ["n1"], attrs={"axes": [0]}),
        OnnxNode("Concat", ["n1", "minus1"], ["target"],
                 attrs={"axis": 0}),
        OnnxNode("Reshape", ["x", "target"], ["y"]),
        OnnxNode("Softmax", ["y"], ["z"], attrs={"axis": -1}),
    ]
    inits = {"zero": np.asarray(0, np.int64),
             "minus1": np.asarray([-1], np.int64)}
    m = roundtrip(make_model(nodes, inits, [("x", (2, 3, 4))],
                             [("z", (2, 12))]), tmp_path)
    x = RNG.standard_normal((2, 3, 4)).astype(np.float32)
    out = np.asarray(m.jitted(x))
    assert out.shape == (2, 12)
    np.testing.assert_allclose(out.sum(-1), np.ones(2), rtol=1e-5)


def test_slice_pad_reduce(tmp_path):
    nodes = [
        OnnxNode("Slice", ["x", "starts", "ends", "axes", "steps"], ["s"]),
        OnnxNode("Pad", ["s", "pads"], ["p"]),
        OnnxNode("ReduceMean", ["p"], ["y"], attrs={"axes": [1],
                                                    "keepdims": 0}),
    ]
    inits = {"starts": np.asarray([1], np.int64),
             "ends": np.asarray([2 ** 62], np.int64),
             "axes": np.asarray([0], np.int64),
             "steps": np.asarray([2], np.int64),
             "pads": np.asarray([0, 1, 0, 1], np.int64)}
    m = roundtrip(make_model(nodes, inits, [("x", (5, 3))], [("y", (3,))]),
                  tmp_path)
    x = RNG.standard_normal((5, 3)).astype(np.float32)
    expect = np.pad(x[1::2], ((0, 0), (1, 1))).mean(1)
    np.testing.assert_allclose(np.asarray(m(x)), expect, rtol=1e-6,
                               atol=1e-6)


def test_if_static_condition(tmp_path):
    then_g = OnnxGraph(
        nodes=[OnnxNode("Mul", ["x", "two"], ["out"])],
        initializers={"two": np.asarray(2.0, np.float32)},
        inputs=[], outputs=[OnnxValueInfo("out")])
    else_g = OnnxGraph(
        nodes=[OnnxNode("Neg", ["x"], ["out"])],
        initializers={}, inputs=[], outputs=[OnnxValueInfo("out")])
    nodes = [OnnxNode("If", ["cond"], ["y"],
                      attrs={"then_branch": then_g, "else_branch": else_g})]
    inits = {"cond": np.asarray(True)}
    m = roundtrip(make_model(nodes, inits, [("x", (3,))], [("y", (3,))]),
                  tmp_path)
    x = np.asarray([1.0, 2.0, 3.0], np.float32)
    np.testing.assert_allclose(np.asarray(m(x)), 2 * x)


def test_unsupported_op_fails_loudly(tmp_path):
    node = OnnxNode("StringNormalizer", ["x"], ["y"], name="weird")
    m = roundtrip(make_model([node], {}, [("x", (2,))], [("y", (2,))]),
                  tmp_path)
    with pytest.raises(UnsupportedOnnxOp, match="StringNormalizer"):
        m(np.zeros(2, np.float32))


def test_conv_stack_jits_token_exact(tmp_path):
    """Eager vs jitted evaluation agree on a small conv net."""
    w1 = RNG.standard_normal((8, 1, 5)).astype(np.float32) * 0.3
    w2 = RNG.standard_normal((4, 8, 3)).astype(np.float32) * 0.3
    nodes = [
        OnnxNode("Conv", ["x", "w1"], ["h"], attrs={"pads": [2, 2],
                                                    "kernel_shape": [5]}),
        OnnxNode("Relu", ["h"], ["hr"]),
        OnnxNode("Conv", ["hr", "w2"], ["h2"], attrs={"strides": [2],
                                                      "kernel_shape": [3]}),
        OnnxNode("GlobalAveragePool", ["h2"], ["g"]),
        OnnxNode("Flatten", ["g"], ["y"]),
    ]
    m = roundtrip(make_model(nodes, {"w1": w1, "w2": w2},
                             [("x", (2, 1, 64))], [("y", (2, 4))]), tmp_path)
    x = RNG.standard_normal((2, 1, 64)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(m.jitted(x)),
                               rtol=1e-6, atol=1e-6)


def test_fp16_int32_data_bit_patterns():
    """TensorProto float16 stored in int32_data (field 5) carries uint16
    BIT PATTERNS per the ONNX spec — the reader must reinterpret, not
    numerically convert (ADVICE r2: numeric conversion corrupts fp16
    checkpoints that don't use raw_data)."""
    import numpy as np

    from openhush_tpu.utils import onnx_io

    vals = np.asarray([1.5, -2.25, 0.0, 3.0e-5], np.float16)
    bits = vals.view(np.uint16)
    payload = b"".join(onnx_io._varint(int(b)) for b in bits)
    blob = (
        onnx_io._tag(1, 0) + onnx_io._varint(4)          # dims: [4]
        + onnx_io._tag(2, 0) + onnx_io._varint(10)       # data_type fp16
        + onnx_io._len_field(5, payload)                  # int32_data
        + onnx_io._str_field(8, "w")                      # name
    )
    t = onnx_io._parse_tensor(memoryview(blob))
    assert t.array.dtype == np.float16
    np.testing.assert_array_equal(t.array, vals)
