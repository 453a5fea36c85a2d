"""ONNX graph → jittable JAX function: the aux-model import path.

The reference runs its auxiliary models (Silero VAD src/vad/silero.rs:54,
openWakeWord src/input/wake_word.rs:121-146, wespeaker/pyannote
src/diarization/mod.rs:266-299) through the ONNX Runtime C++ library. The
TPU rebuild instead *imports* those published .onnx checkpoints into JAX:
this module walks the decoded graph (utils/onnx_io.py) and evaluates each
node with jax.numpy/lax ops, producing a callable that jits, vmaps and
shards like any other JAX function — so aux models batch onto the TPU
alongside the Whisper decoder instead of running on a separate runtime.

Evaluation is a two-level partial evaluator: values derived only from
initializers/Constant nodes (shape vectors, slice indices, reshape
targets) are computed eagerly with numpy and stay concrete, so data-
dependent-looking shape arithmetic in exported graphs folds away and the
traced JAX graph keeps static shapes (an XLA requirement). Everything
touched by a real input is traced with jnp.

Unsupported ops fail loudly with the node name and op type so a gap in
coverage is a clear error, never silent wrong numerics.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.utils import onnx_io
from openhush_tpu.utils.onnx_io import OnnxGraph, OnnxModel, OnnxNode


class UnsupportedOnnxOp(NotImplementedError):
    pass


def _is_static(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def _all_static(vals) -> bool:
    return all(_is_static(v) for v in vals)


def _xp(vals):
    return np if _all_static(vals) else jnp


_ONNX_ELEM_NP = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
                 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


def _int_list(v) -> list[int]:
    return [int(x) for x in np.asarray(v).reshape(-1)]


# ---------------------------------------------------------------------------
# Convolution / pooling helpers (ONNX NCHW layouts)
# ---------------------------------------------------------------------------

def _conv_dims(rank: int):
    sp = "DHW"[3 - rank:]
    return (f"NC{sp}", f"OI{sp}", f"NC{sp}")


def _resolve_pads(attrs: dict, spatial: int, in_shape, k_shape,
                  strides, dilations) -> list[tuple[int, int]]:
    auto = (attrs.get("auto_pad") or b"NOTSET")
    auto = auto.decode() if isinstance(auto, bytes) else auto
    if auto in ("NOTSET", ""):
        pads = attrs.get("pads") or [0] * (2 * spatial)
        return [(int(pads[i]), int(pads[i + spatial]))
                for i in range(spatial)]
    if auto == "VALID":
        return [(0, 0)] * spatial
    out = []
    for i in range(spatial):
        eff_k = (k_shape[i] - 1) * dilations[i] + 1
        out_dim = -(-in_shape[i] // strides[i])
        pad = max(0, (out_dim - 1) * strides[i] + eff_k - in_shape[i])
        if auto == "SAME_UPPER":
            out.append((pad // 2, pad - pad // 2))
        else:  # SAME_LOWER
            out.append((pad - pad // 2, pad // 2))
    return out


def _op_conv(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0])
    w = jnp.asarray(vals[1])
    spatial = x.ndim - 2
    strides = _int_list(node.attrs.get("strides") or [1] * spatial)
    dilations = _int_list(node.attrs.get("dilations") or [1] * spatial)
    group = int(node.attrs.get("group") or 1)
    pads = _resolve_pads(node.attrs, spatial, x.shape[2:], w.shape[2:],
                         strides, dilations)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=strides, padding=pads, rhs_dilation=dilations,
        dimension_numbers=_conv_dims(spatial), feature_group_count=group,
        precision=jax.lax.Precision.HIGHEST)
    if len(vals) > 2 and vals[2] is not None:
        b = jnp.asarray(vals[2]).reshape((1, -1) + (1,) * spatial)
        out = out + b
    return out


def _op_conv_transpose(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0], jnp.float32)
    w = jnp.asarray(vals[1], jnp.float32)   # [C_in, C_out/group, k...]
    spatial = x.ndim - 2
    if int(node.attrs.get("group") or 1) != 1:
        raise UnsupportedOnnxOp("ConvTranspose with group>1")
    strides = _int_list(node.attrs.get("strides") or [1] * spatial)
    pads = node.attrs.get("pads") or [0] * (2 * spatial)
    padding = [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    # lax.conv_transpose with transpose_kernel handles the IOHW layout.
    out = jax.lax.conv_transpose(
        x, w, strides=strides,
        padding=[(k - 1 - lo, k - 1 - hi)
                 for (lo, hi), k in zip(padding, w.shape[2:])],
        dimension_numbers=_conv_dims(spatial), transpose_kernel=True)
    if len(vals) > 2 and vals[2] is not None:
        out = out + jnp.asarray(vals[2]).reshape((1, -1) + (1,) * spatial)
    return out


def _pool(node: OnnxNode, x, kind: str):
    x = jnp.asarray(x)
    spatial = x.ndim - 2
    k = _int_list(node.attrs["kernel_shape"])
    strides = _int_list(node.attrs.get("strides") or [1] * spatial)
    dilations = _int_list(node.attrs.get("dilations") or [1] * spatial)
    pads = _resolve_pads(node.attrs, spatial, x.shape[2:], k,
                         strides, dilations)
    window = (1, 1) + tuple(k)
    wstrides = (1, 1) + tuple(strides)
    wdil = (1, 1) + tuple(dilations)
    padding = [(0, 0), (0, 0)] + pads
    if kind == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
            jnp.iinfo(x.dtype).min)
        return jax.lax.reduce_window(x, init, jax.lax.max, window, wstrides,
                                     padding, window_dilation=wdil)
    total = jax.lax.reduce_window(x.astype(jnp.float32), 0.0, jax.lax.add,
                                  window, wstrides, padding,
                                  window_dilation=wdil)
    if int(node.attrs.get("count_include_pad") or 0):
        denom = float(np.prod(k))
        return total / denom
    ones = jnp.ones(x.shape, jnp.float32)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, wstrides,
                                   padding, window_dilation=wdil)
    return total / counts


# ---------------------------------------------------------------------------
# Recurrent ops (ONNX LSTM / GRU semantics incl. gate orders)
# ---------------------------------------------------------------------------

def _rnn_directions(node: OnnxNode) -> list[str]:
    d = node.attrs.get("direction") or b"forward"
    d = d.decode() if isinstance(d, bytes) else d
    return {"forward": ["fwd"], "reverse": ["rev"],
            "bidirectional": ["fwd", "rev"]}[d]


def _op_lstm(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0], jnp.float32)          # [T, B, I]
    W = np.asarray(vals[1], np.float32)            # [D, 4H, I]  (iofc)
    R = np.asarray(vals[2], np.float32)            # [D, 4H, H]
    D, fourH, _ = W.shape
    H = fourH // 4
    B = x.shape[1]
    Bias = (np.asarray(vals[3], np.float32) if len(vals) > 3
            and vals[3] is not None else np.zeros((D, 8 * H), np.float32))
    h0 = (jnp.asarray(vals[5], jnp.float32) if len(vals) > 5
          and vals[5] is not None else jnp.zeros((D, B, H)))
    c0 = (jnp.asarray(vals[6], jnp.float32) if len(vals) > 6
          and vals[6] is not None else jnp.zeros((D, B, H)))

    def run_dir(d: int, reverse: bool):
        Wd, Rd = jnp.asarray(W[d].T), jnp.asarray(R[d].T)    # [I,4H],[H,4H]
        b = jnp.asarray(Bias[d, :4 * H] + Bias[d, 4 * H:])
        xs = jnp.flip(x, 0) if reverse else x
        xw = xs @ Wd + b                                      # [T, B, 4H]

        def step(carry, xt):
            h, c = carry
            g = xt + h @ Rd
            i = jax.nn.sigmoid(g[..., :H])
            o = jax.nn.sigmoid(g[..., H:2 * H])
            f = jax.nn.sigmoid(g[..., 2 * H:3 * H])
            cc = jnp.tanh(g[..., 3 * H:])
            c = f * c + i * cc
            h = o * jnp.tanh(c)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(step, (h0[d], c0[d]), xw)
        if reverse:
            ys = jnp.flip(ys, 0)
        return ys, hT, cT

    dirs = _rnn_directions(node)
    outs = [run_dir(i, d == "rev") for i, d in enumerate(dirs)]
    Y = jnp.stack([o[0] for o in outs], axis=1)               # [T, D, B, H]
    Yh = jnp.stack([o[1] for o in outs], axis=0)              # [D, B, H]
    Yc = jnp.stack([o[2] for o in outs], axis=0)
    return (Y, Yh, Yc)


def _op_gru(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0], jnp.float32)          # [T, B, I]
    W = np.asarray(vals[1], np.float32)            # [D, 3H, I]  (zrh)
    R = np.asarray(vals[2], np.float32)
    D, threeH, _ = W.shape
    H = threeH // 3
    B = x.shape[1]
    Bias = (np.asarray(vals[3], np.float32) if len(vals) > 3
            and vals[3] is not None else np.zeros((D, 6 * H), np.float32))
    h0 = (jnp.asarray(vals[5], jnp.float32) if len(vals) > 5
          and vals[5] is not None else jnp.zeros((D, B, H)))
    lbr = int(node.attrs.get("linear_before_reset") or 0)

    def run_dir(d: int, reverse: bool):
        Wd, Rd = jnp.asarray(W[d].T), jnp.asarray(R[d].T)
        wb, rb = jnp.asarray(Bias[d, :3 * H]), jnp.asarray(Bias[d, 3 * H:])
        xs = jnp.flip(x, 0) if reverse else x
        xw = xs @ Wd + wb

        def step(h, xt):
            hr = h @ Rd
            z = jax.nn.sigmoid(xt[..., :H] + hr[..., :H] + rb[:H])
            r = jax.nn.sigmoid(xt[..., H:2 * H] + hr[..., H:2 * H]
                               + rb[H:2 * H])
            if lbr:
                n = jnp.tanh(xt[..., 2 * H:]
                             + r * (hr[..., 2 * H:] + rb[2 * H:]))
            else:
                n = jnp.tanh(xt[..., 2 * H:]
                             + (r * h) @ Rd[:, 2 * H:] + rb[2 * H:])
            h = (1 - z) * n + z * h
            return h, h

        hT, ys = jax.lax.scan(step, h0[d], xw)
        if reverse:
            ys = jnp.flip(ys, 0)
        return ys, hT

    dirs = _rnn_directions(node)
    outs = [run_dir(i, d == "rev") for i, d in enumerate(dirs)]
    Y = jnp.stack([o[0] for o in outs], axis=1)
    Yh = jnp.stack([o[1] for o in outs], axis=0)
    return (Y, Yh)


# ---------------------------------------------------------------------------
# Node dispatch
# ---------------------------------------------------------------------------

def _unary(fn_np, fn_jnp=None):
    def op(node, vals):
        v = vals[0]
        if _is_static(v):
            return fn_np(np.asarray(v))
        return (fn_jnp or fn_np)(v)
    return op


def _binary(fn):
    def op(node, vals):
        a, b = vals[0], vals[1]
        if _all_static(vals[:2]):
            return fn(np.asarray(a), np.asarray(b))
        return fn(jnp.asarray(a), jnp.asarray(b))
    return op


def _axes_arg(node: OnnxNode, vals: list, idx: int = 1):
    """Axes come as an attribute (old opsets) or trailing input (new)."""
    if "axes" in node.attrs and node.attrs["axes"] is not None:
        return _int_list(node.attrs["axes"])
    if len(vals) > idx and vals[idx] is not None:
        return _int_list(vals[idx])
    return None


def _reduce(fn_np, fn_jnp):
    def op(node, vals):
        axes = _axes_arg(node, vals)
        keep = bool(int(node.attrs.get("keepdims", 1)))
        axes_t = tuple(axes) if axes is not None else None
        if (axes_t is None and
                int(node.attrs.get("noop_with_empty_axes") or 0)):
            return vals[0]
        if _is_static(vals[0]):
            return fn_np(np.asarray(vals[0]), axis=axes_t, keepdims=keep)
        return fn_jnp(vals[0], axis=axes_t, keepdims=keep)
    return op


def _op_slice(node: OnnxNode, vals: list):
    x = vals[0]
    if "starts" in node.attrs:                    # opset < 10
        starts = _int_list(node.attrs["starts"])
        ends = _int_list(node.attrs["ends"])
        axes = _int_list(node.attrs.get("axes")
                         or range(len(starts)))
        steps = [1] * len(starts)
    else:
        starts = _int_list(vals[1])
        ends = _int_list(vals[2])
        axes = (_int_list(vals[3]) if len(vals) > 3 and vals[3] is not None
                else list(range(len(starts))))
        steps = (_int_list(vals[4]) if len(vals) > 4 and vals[4] is not None
                 else [1] * len(starts))
    nd = np.asarray(x).ndim if _is_static(x) else x.ndim
    sl = [slice(None)] * nd
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        # ONNX clamps out-of-range ends (INT64_MAX conventions)
        en_c = None if en >= 2 ** 31 else en
        st_c = st
        sl[ax % nd] = slice(st_c, en_c, sp)
    return x[tuple(sl)]


def _op_gemm(node: OnnxNode, vals: list):
    a, b = jnp.asarray(vals[0], jnp.float32), jnp.asarray(vals[1],
                                                          jnp.float32)
    if int(node.attrs.get("transA") or 0):
        a = a.T
    if int(node.attrs.get("transB") or 0):
        b = b.T
    alpha = float(node.attrs.get("alpha") or 1.0)
    beta = float(node.attrs.get("beta") or 1.0)
    out = alpha * jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    if len(vals) > 2 and vals[2] is not None:
        out = out + beta * jnp.asarray(vals[2])
    return out


def _op_batchnorm(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0])
    scale, bias, mean, var = (jnp.asarray(v, jnp.float32)
                              for v in vals[1:5])
    eps = float(node.attrs.get("epsilon") or 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.reshape(shape)) * (scale * inv).reshape(shape) \
        + bias.reshape(shape)


def _op_layernorm(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0], jnp.float32)
    axis = int(node.attrs.get("axis", -1))
    eps = float(node.attrs.get("epsilon") or 1e-5)
    axes = tuple(range(axis % x.ndim, x.ndim))
    mean = jnp.mean(x, axes, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axes, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    out = out * jnp.asarray(vals[1])
    if len(vals) > 2 and vals[2] is not None:
        out = out + jnp.asarray(vals[2])
    return out


def _op_instancenorm(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0], jnp.float32)
    eps = float(node.attrs.get("epsilon") or 1e-5)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axes, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - mean) * jax.lax.rsqrt(var + eps)
            * jnp.asarray(vals[1]).reshape(shape)
            + jnp.asarray(vals[2]).reshape(shape))


def _op_pad(node: OnnxNode, vals: list):
    x = vals[0]
    if "pads" in node.attrs:
        pads = _int_list(node.attrs["pads"])
        cval = float(node.attrs.get("value") or 0.0)
    else:
        pads = _int_list(vals[1])
        cval = (float(np.asarray(vals[2]).reshape(-1)[0])
                if len(vals) > 2 and vals[2] is not None else 0.0)
    mode = node.attrs.get("mode") or b"constant"
    mode = mode.decode() if isinstance(mode, bytes) else mode
    nd = np.asarray(x).ndim if _is_static(x) else x.ndim
    pairs = [(pads[i], pads[i + nd]) for i in range(nd)]
    xp = _xp([x])
    if mode == "constant":
        return xp.pad(x, pairs, constant_values=cval)
    return xp.pad(x, pairs, mode={"reflect": "reflect",
                                  "edge": "edge"}[mode])


def _op_resize(node: OnnxNode, vals: list):
    x = jnp.asarray(vals[0])
    mode = node.attrs.get("mode") or b"nearest"
    mode = mode.decode() if isinstance(mode, bytes) else mode
    sizes = None
    if len(vals) > 3 and vals[3] is not None:
        sizes = _int_list(vals[3])
    elif len(vals) > 2 and vals[2] is not None:
        scales = np.asarray(vals[2], np.float64).reshape(-1)
        if scales.size:
            sizes = [int(round(s * d)) for s, d in zip(scales, x.shape)]
    if sizes is None:
        return x
    method = {"nearest": "nearest", "linear": "linear",
              "cubic": "cubic"}[mode]
    return jax.image.resize(x, tuple(sizes), method=method)


_OPS: dict[str, Callable[[OnnxNode, list], Any]] = {
    "Add": _binary(lambda a, b: a + b),
    "Sub": _binary(lambda a, b: a - b),
    "Mul": _binary(lambda a, b: a * b),
    "Div": _binary(lambda a, b: a / b if a.dtype.kind == "f"
                   or (hasattr(b, "dtype") and b.dtype.kind == "f")
                   else a // b),
    "Pow": _binary(lambda a, b: a ** b),
    "Min": lambda n, v: functools.reduce(
        (np.minimum if _all_static(v) else jnp.minimum), v),
    "Max": lambda n, v: functools.reduce(
        (np.maximum if _all_static(v) else jnp.maximum), v),
    "Sqrt": _unary(np.sqrt, jnp.sqrt),
    "Exp": _unary(np.exp, jnp.exp),
    "Log": _unary(np.log, jnp.log),
    "Neg": _unary(lambda x: -x),
    "Abs": _unary(np.abs, jnp.abs),
    "Floor": _unary(np.floor, jnp.floor),
    "Ceil": _unary(np.ceil, jnp.ceil),
    "Round": _unary(np.round, jnp.round),
    "Reciprocal": _unary(lambda x: 1.0 / x),
    "Erf": _unary(lambda x: np.vectorize(__import__("math").erf)(
        x).astype(np.float32), jax.lax.erf),
    "Relu": _unary(lambda x: np.maximum(x, 0), jax.nn.relu),
    "Sigmoid": _unary(lambda x: 1 / (1 + np.exp(-x)), jax.nn.sigmoid),
    "Tanh": _unary(np.tanh, jnp.tanh),
    "Softplus": _unary(lambda x: np.log1p(np.exp(x)), jax.nn.softplus),
    "Identity": lambda n, v: v[0],
    "Dropout": lambda n, v: v[0],
    "Not": _unary(np.logical_not, jnp.logical_not),
    "And": _binary(lambda a, b: a & b),
    "Or": _binary(lambda a, b: a | b),
    "Equal": _binary(lambda a, b: a == b),
    "Greater": _binary(lambda a, b: a > b),
    "GreaterOrEqual": _binary(lambda a, b: a >= b),
    "Less": _binary(lambda a, b: a < b),
    "LessOrEqual": _binary(lambda a, b: a <= b),
    "Where": lambda n, v: (np.where if _all_static(v) else jnp.where)(
        v[0], v[1], v[2]),
    "MatMul": lambda n, v: jnp.matmul(
        jnp.asarray(v[0], jnp.float32), jnp.asarray(v[1], jnp.float32),
        precision=jax.lax.Precision.HIGHEST),
    "Gemm": _op_gemm,
    "Conv": _op_conv,
    "ConvTranspose": _op_conv_transpose,
    "BatchNormalization": _op_batchnorm,
    "LayerNormalization": _op_layernorm,
    "InstanceNormalization": _op_instancenorm,
    "LSTM": _op_lstm,
    "GRU": _op_gru,
    "MaxPool": lambda n, v: _pool(n, v[0], "max"),
    "AveragePool": lambda n, v: _pool(n, v[0], "avg"),
    "GlobalAveragePool": lambda n, v: jnp.mean(
        jnp.asarray(v[0]), axis=tuple(range(2, jnp.asarray(v[0]).ndim)),
        keepdims=True),
    "GlobalMaxPool": lambda n, v: jnp.max(
        jnp.asarray(v[0]), axis=tuple(range(2, jnp.asarray(v[0]).ndim)),
        keepdims=True),
    "Softmax": lambda n, v: jax.nn.softmax(
        jnp.asarray(v[0], jnp.float32),
        axis=int(n.attrs.get("axis", -1))),
    "LogSoftmax": lambda n, v: jax.nn.log_softmax(
        jnp.asarray(v[0], jnp.float32),
        axis=int(n.attrs.get("axis", -1))),
    "LeakyRelu": lambda n, v: jax.nn.leaky_relu(
        jnp.asarray(v[0]), float(n.attrs.get("alpha") or 0.01)),
    "PRelu": lambda n, v: jnp.where(jnp.asarray(v[0]) >= 0, v[0],
                                    jnp.asarray(v[1]) * v[0]),
    "Elu": lambda n, v: jax.nn.elu(jnp.asarray(v[0]),
                                   float(n.attrs.get("alpha") or 1.0)),
    "HardSigmoid": lambda n, v: jnp.clip(
        float(n.attrs.get("alpha") or 0.2) * jnp.asarray(v[0])
        + float(n.attrs.get("beta") or 0.5), 0.0, 1.0),
    "ReduceMean": _reduce(np.mean, jnp.mean),
    "ReduceSum": _reduce(np.sum, jnp.sum),
    "ReduceMax": _reduce(np.max, jnp.max),
    "ReduceMin": _reduce(np.min, jnp.min),
    "ReduceProd": _reduce(np.prod, jnp.prod),
    "ReduceL2": _reduce(lambda x, axis, keepdims:
                        np.sqrt(np.sum(x * x, axis=axis, keepdims=keepdims)),
                        lambda x, axis, keepdims:
                        jnp.sqrt(jnp.sum(x * x, axis=axis,
                                         keepdims=keepdims))),
    "ArgMax": lambda n, v: (np.argmax if _is_static(v[0]) else jnp.argmax)(
        v[0], axis=int(n.attrs.get("axis", 0))),
    "Slice": _op_slice,
    "Pad": _op_pad,
    "Resize": _op_resize,
    "Clip": lambda n, v: (np.clip if _is_static(v[0]) else jnp.clip)(
        v[0],
        (np.asarray(v[1]).item() if len(v) > 1 and v[1] is not None
         else n.attrs.get("min")),
        (np.asarray(v[2]).item() if len(v) > 2 and v[2] is not None
         else n.attrs.get("max"))),
    "Cast": lambda n, v: (
        np.asarray(v[0]).astype(_ONNX_ELEM_NP[int(n.attrs["to"])])
        if _is_static(v[0])
        else v[0].astype(_ONNX_ELEM_NP[int(n.attrs["to"])])),
}


def _op_shape(node, vals):
    v = vals[0]
    shape = np.asarray(v).shape if _is_static(v) else v.shape
    start = int(node.attrs.get("start") or 0)
    end = node.attrs.get("end")
    sl = shape[start: int(end) if end is not None else None]
    return np.asarray(sl, np.int64)


def _op_reshape(node, vals):
    target = _int_list(vals[1])
    x = vals[0]
    in_shape = np.asarray(x).shape if _is_static(x) else x.shape
    if int(node.attrs.get("allowzero") or 0) == 0:
        target = [in_shape[i] if t == 0 else t
                  for i, t in enumerate(target)]
    xp = _xp([x])
    return xp.reshape(x, target)


def _op_concat(node, vals):
    axis = int(node.attrs.get("axis", 0))
    if _all_static(vals):
        return np.concatenate([np.asarray(v) for v in vals], axis=axis)
    return jnp.concatenate([jnp.asarray(v) for v in vals], axis=axis)


def _op_gather(node, vals):
    axis = int(node.attrs.get("axis", 0))
    x, idx = vals[0], vals[1]
    if _all_static(vals[:2]):
        return np.take(np.asarray(x), np.asarray(idx, np.int64), axis=axis)
    return jnp.take(jnp.asarray(x), jnp.asarray(idx), axis=axis)


def _op_squeeze(node, vals):
    axes = _axes_arg(node, vals)
    x = vals[0]
    xp = _xp([x])
    if axes is None:
        return xp.squeeze(x)
    nd = np.asarray(x).ndim if _is_static(x) else x.ndim
    return xp.squeeze(x, axis=tuple(a % nd for a in axes))


def _op_unsqueeze(node, vals):
    axes = sorted(_axes_arg(node, vals) or [0])
    x = vals[0]
    xp = _xp([x])
    for a in axes:
        x = xp.expand_dims(x, a)
    return x


def _op_transpose(node, vals):
    x = vals[0]
    perm = node.attrs.get("perm")
    xp = _xp([x])
    return xp.transpose(x, perm if perm is None else _int_list(perm))


def _op_flatten(node, vals):
    x = vals[0]
    axis = int(node.attrs.get("axis", 1))
    shape = np.asarray(x).shape if _is_static(x) else x.shape
    lead = int(np.prod(shape[:axis])) if axis else 1
    xp = _xp([x])
    return xp.reshape(x, (lead, -1))


def _op_expand(node, vals):
    target = _int_list(vals[1])
    x = vals[0]
    shape = np.asarray(x).shape if _is_static(x) else x.shape
    # ONNX Expand uses numpy broadcasting; dims of 1 in target keep input
    ndiff = len(target) - len(shape)
    full = list(target)
    for i, s in enumerate(shape):
        t = full[ndiff + i]
        full[ndiff + i] = s if t == 1 else t
    xp = _xp([x])
    return xp.broadcast_to(x, tuple(full))


def _op_tile(node, vals):
    reps = _int_list(vals[1])
    xp = _xp([vals[0]])
    return xp.tile(vals[0], reps)


def _op_split(node, vals):
    x = vals[0]
    axis = int(node.attrs.get("axis", 0))
    shape = np.asarray(x).shape if _is_static(x) else x.shape
    if "split" in node.attrs and node.attrs["split"] is not None:
        sizes = _int_list(node.attrs["split"])
    elif len(vals) > 1 and vals[1] is not None:
        sizes = _int_list(vals[1])
    else:
        n = int(node.attrs.get("num_outputs") or len(node.outputs))
        base = shape[axis] // n
        sizes = [base] * n
        sizes[-1] += shape[axis] - base * n
    offs = np.cumsum([0] + sizes)
    out = []
    for i in range(len(sizes)):
        sl = [slice(None)] * len(shape)
        sl[axis] = slice(int(offs[i]), int(offs[i + 1]))
        out.append(x[tuple(sl)])
    return tuple(out)


def _op_constant_of_shape(node, vals):
    shape = _int_list(vals[0])
    fill = node.attrs.get("value")
    if fill is None:
        return np.zeros(shape, np.float32)
    fill = np.asarray(fill).reshape(-1)
    return np.full(shape, fill[0], fill.dtype)


def _op_range(node, vals):
    s, e, d = (np.asarray(v).item() for v in vals[:3])
    return np.arange(s, e, d)


_OPS.update({
    "Shape": _op_shape,
    "Size": lambda n, v: np.asarray(
        int(np.prod(np.asarray(v[0]).shape if _is_static(v[0])
                    else v[0].shape)), np.int64),
    "Reshape": _op_reshape,
    "Concat": _op_concat,
    "Gather": _op_gather,
    "Squeeze": _op_squeeze,
    "Unsqueeze": _op_unsqueeze,
    "Transpose": _op_transpose,
    "Flatten": _op_flatten,
    "Expand": _op_expand,
    "Tile": _op_tile,
    "Split": _op_split,
    "ConstantOfShape": _op_constant_of_shape,
    "Range": _op_range,
})


# ---------------------------------------------------------------------------
# Graph evaluation
# ---------------------------------------------------------------------------

def _eval_graph(graph: OnnxGraph, env: dict[str, Any]) -> list:
    for node in graph.nodes:
        if node.op_type == "Constant":
            val = node.attrs.get("value")
            if val is None:
                for k in ("value_float", "value_int"):
                    if k in node.attrs:
                        val = np.asarray(node.attrs[k])
                if "value_ints" in node.attrs:
                    val = np.asarray(node.attrs["value_ints"], np.int64)
                if "value_floats" in node.attrs:
                    val = np.asarray(node.attrs["value_floats"], np.float32)
            env[node.outputs[0]] = val
            continue
        if node.op_type == "If":
            cond = env[node.inputs[0]]
            if not _is_static(cond):
                raise UnsupportedOnnxOp(
                    f"If node '{node.name}' with traced condition")
            branch = (node.attrs["then_branch"] if np.asarray(cond).item()
                      else node.attrs["else_branch"])
            sub_env = dict(env)
            sub_env.update(branch.initializers)
            results = _eval_graph(branch, sub_env)
            for out_name, res in zip(node.outputs, results):
                env[out_name] = res
            continue
        fn = _OPS.get(node.op_type)
        if fn is None:
            raise UnsupportedOnnxOp(
                f"op '{node.op_type}' (node '{node.name}') is not in the "
                f"importer's op set; supported: {sorted(_OPS)}")
        vals = [env.get(name) if name else None for name in node.inputs]
        result = fn(node, vals)
        if isinstance(result, tuple):
            for out_name, res in zip(node.outputs, result):
                if out_name:
                    env[out_name] = res
        else:
            env[node.outputs[0]] = result
    return [env[vi.name] for vi in graph.outputs]


class OnnxJaxModel:
    """A decoded ONNX model evaluated with JAX ops.

    `model(x, y, ...)` runs the graph eagerly (inputs in graph-input
    order, initializers excluded). `.jitted` is the jax.jit-compiled
    version. Weights are closure constants — XLA folds and lays them out
    on device, so repeated calls don't re-upload.
    """

    def __init__(self, model: OnnxModel):
        self.model = model
        graph = model.graph
        init_names = set(graph.initializers)
        self.input_names = [vi.name for vi in graph.inputs
                            if vi.name not in init_names]
        self.output_names = [vi.name for vi in graph.outputs]
        self._jit = None

    @classmethod
    def load(cls, path: str) -> "OnnxJaxModel":
        return cls(onnx_io.load(path))

    def __call__(self, *args, **kwargs):
        env: dict[str, Any] = dict(self.model.graph.initializers)
        if kwargs:
            env.update(kwargs)
        for name, val in zip(self.input_names, args):
            env[name] = val
        missing = [n for n in self.input_names if n not in env]
        if missing:
            raise ValueError(f"missing graph inputs: {missing}")
        outs = _eval_graph(self.model.graph, env)
        outs = [jnp.asarray(o) if _is_static(o) else o for o in outs]
        return outs[0] if len(outs) == 1 else tuple(outs)

    @property
    def jitted(self):
        if self._jit is None:
            self._jit = jax.jit(lambda *a: self(*a))
        return self._jit

    # Persistence: the original .onnx bytes are the canonical format; a
    # converted copy is written next to the npz weights for provenance.
    def save(self, path: str) -> None:
        onnx_io.save(self.model, path)
