"""Aux-model checkpoint converters: Silero VAD (torch-jit) and RNNoise
(published text model format).

The Silero test builds a torch replica of the v5 graph with the real
checkpoint's module paths (_model.stft.forward_basis_buffer,
_model.encoder.N.reparam_conv.*, _model.decoder.rnn.*,
_model.decoder.decoder.2.*), TorchScript-saves it, converts with
`convert_jit`, and checks the JAX forward tracks the torch forward
chunk-by-chunk with carried state — so a real silero_vad.jit maps
correctly first-try (reference consumption: src/vad/silero.rs:54).

The RNNoise test writes a model file in the `rnnoise_model_from_file`
text format (xiph rnnoise src/rnn_reader.c) and checks the JAX network
against an independent numpy implementation of the C compute_gru/
compute_dense semantics (reference consumption: src/input/audio.rs:293).
"""

import numpy as np
import pytest

from openhush_tpu.models import silero
from openhush_tpu.ops import rnnoise_model

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# Silero
# ---------------------------------------------------------------------------

class _Stft(torch.nn.Module):
    def __init__(self):
        super().__init__()
        n = np.arange(silero.N_FFT)
        k = np.arange(silero.N_BINS)
        window = np.hanning(silero.N_FFT + 1)[:-1]
        ang = 2 * np.pi * np.outer(k, n) / silero.N_FFT
        basis = np.concatenate([np.cos(ang), -np.sin(ang)]) * window
        self.register_buffer(
            "forward_basis_buffer",
            torch.from_numpy(basis[:, None, :].astype(np.float32)))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        # x [1, 576] → reflect-pad left 64 → conv stride 128 → magnitude
        x = torch.nn.functional.pad(x.unsqueeze(1), (64, 0), mode="reflect")
        spec = torch.nn.functional.conv1d(x, self.forward_basis_buffer,
                                          stride=128)
        re, im = spec[:, :129], spec[:, 129:]
        return torch.sqrt(re * re + im * im + 1e-12)


class _EncBlock(torch.nn.Module):
    def __init__(self, cin: int, cout: int, stride: int):
        super().__init__()
        self.reparam_conv = torch.nn.Conv1d(cin, cout, 3, stride=stride,
                                            padding=1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return torch.relu(self.reparam_conv(x))


class _Decoder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.rnn = torch.nn.LSTMCell(128, 128)
        self.decoder = torch.nn.Sequential(
            torch.nn.Dropout(0.0), torch.nn.ReLU(),
            torch.nn.Conv1d(128, 1, 1), torch.nn.Sigmoid())


class _Core(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.stft = _Stft()
        self.encoder = torch.nn.Sequential(
            _EncBlock(129, 128, 1), _EncBlock(128, 64, 2),
            _EncBlock(64, 64, 2), _EncBlock(64, 128, 1))
        self.decoder = _Decoder()


class SileroReplica(torch.nn.Module):
    """Forward mirrors models/silero.py's documented v5 graph."""

    def __init__(self):
        super().__init__()
        self._model = _Core()

    def forward(self, chunk: torch.Tensor, h: torch.Tensor,
                c: torch.Tensor, context: torch.Tensor):
        x = torch.cat([context, chunk], dim=1)           # [1, 576]
        mag = self._model.stft(x)                        # [1, 129, T]
        feat = self._model.encoder(mag)                  # [1, 128, T']
        feat = feat.mean(dim=2)                          # [1, 128]
        h2, c2 = self._model.decoder.rnn(feat, (h, c))
        out = self._model.decoder.decoder(h2.unsqueeze(-1))
        return out[:, 0, 0], h2, c2, chunk[:, -64:]


def test_silero_jit_convert_matches_torch(tmp_path):
    torch.manual_seed(3)
    replica = SileroReplica().eval()
    path = str(tmp_path / "silero_vad.jit")
    torch.jit.save(torch.jit.script(replica), path)

    params = silero.convert_jit(path)
    state = silero.init_state()
    h = torch.zeros(1, 128)
    c = torch.zeros(1, 128)
    ctx = torch.zeros(1, 64)
    for step in range(5):
        chunk = RNG.standard_normal(silero.CHUNK).astype(np.float32) * 0.1
        with torch.no_grad():
            ref, h, c, ctx = replica(torch.from_numpy(chunk)[None], h, c,
                                     ctx)
        state, prob = silero.forward_chunk(params, state,
                                           np.asarray(chunk),
                                           pad_mode="left")
        assert float(prob) == pytest.approx(float(ref[0]), abs=2e-5), step


def test_silero_npz_roundtrip_and_engine(tmp_path):
    params = silero.init_params(__import__("jax").random.PRNGKey(0))
    path = str(tmp_path / "silero.npz")
    silero.save_npz(params, path, pad_mode="right")
    vad = silero.SileroVad.load(path)
    assert vad.pad_mode == "right"
    res = vad.process(RNG.standard_normal(512).astype(np.float32))
    assert 0.0 <= res.probability <= 1.0
    # state carries: same chunk twice gives a different (stateful) answer
    res2 = vad.process(RNG.standard_normal(512).astype(np.float32))
    assert np.isfinite(res2.probability)


def test_silero_convert_rejects_wrong_shapes():
    sd = {k: torch.zeros(*s) for k, (_, s) in
          silero._JIT_NAME_MAP.items()}
    sd["_model.decoder.rnn.weight_ih"] = torch.zeros(512, 64)  # wrong
    with pytest.raises(ValueError, match="weight_ih"):
        silero.convert_state_dict(sd)


def test_silero_convert_reports_missing():
    with pytest.raises(ValueError, match="missing expected"):
        silero.convert_state_dict({})


# ---------------------------------------------------------------------------
# RNNoise
# ---------------------------------------------------------------------------

def _dense_text(m, n, rng):
    w = rng.integers(-127, 128, size=m * n)
    b = rng.integers(-127, 128, size=n)
    act = 0 if n > 1 else 1
    return (f"{m} {n} " + " ".join(map(str, w)) + " "
            + " ".join(map(str, b)) + f" {act}"), (w, b, act)


def _gru_text(m, n, rng, act=2):
    wx = rng.integers(-127, 128, size=m * 3 * n)
    wh = rng.integers(-127, 128, size=n * 3 * n)
    b = rng.integers(-127, 128, size=3 * n)
    return (f"{m} {n} " + " ".join(map(str, wx)) + " "
            + " ".join(map(str, wh)) + " " + " ".join(map(str, b))
            + f" {act}"), (wx, wh, b, act)


def _np_dense(raw, m, n, x):
    w, b, act = raw
    s = (x @ (w.reshape(m, n) / 256.0)) + b / 256.0
    if act == 0:
        return np.tanh(s)
    if act == 1:
        return 1 / (1 + np.exp(-s))
    return np.maximum(s, 0)


def _np_gru(raw, m, n, x, h):
    """Direct transcription of rnnoise compute_gru (column-major sums)."""
    wx, wh, b, act = raw
    wx = wx.reshape(m, 3 * n) / 256.0
    wh = wh.reshape(n, 3 * n) / 256.0
    b = b / 256.0
    z = 1 / (1 + np.exp(-(x @ wx[:, :n] + h @ wh[:, :n] + b[:n])))
    r = 1 / (1 + np.exp(-(x @ wx[:, n:2 * n] + h @ wh[:, n:2 * n]
                          + b[n:2 * n])))
    pre = x @ wx[:, 2 * n:] + (r * h) @ wh[:, 2 * n:] + b[2 * n:]
    cand = np.maximum(pre, 0) if act == 2 else np.tanh(pre)
    return z * h + (1 - z) * cand


def _build_model_text(rng):
    x, d, v, nz, dn, g = 42, 24, 24, 48, 96, 22
    parts = ["rnnoise-nu model file version 1"]
    t, raw_in = _dense_text(x, d, rng)
    parts.append(t)
    t, raw_vg = _gru_text(d, v, rng, act=0)
    parts.append(t)
    t, raw_ng = _gru_text(d + v + x, nz, rng)
    parts.append(t)
    t, raw_dg = _gru_text(v + nz + x, dn, rng)
    parts.append(t)
    t, raw_out = _dense_text(dn, g, rng)
    parts.append(t)
    t, raw_vad = _dense_text(v, 1, rng)
    parts.append(t)
    return "\n".join(parts), (raw_in, raw_vg, raw_ng, raw_dg, raw_out,
                              raw_vad)


def test_rnnoise_parse_and_exact_semantics(tmp_path):
    rng = np.random.default_rng(11)
    text, raws = _build_model_text(rng)
    path = tmp_path / "model.rnnn"
    path.write_text(text)
    params = rnnoise_model.load(str(path))

    raw_in, raw_vg, raw_ng, raw_dg, raw_out, raw_vad = raws
    x, d, v, nz, dn, g = 42, 24, 24, 48, 96, 22
    hv = np.zeros(v)
    hn = np.zeros(nz)
    hd = np.zeros(dn)
    state = rnnoise_model.init_rnn_state(params)
    for _ in range(4):
        feats = rng.standard_normal(42).astype(np.float32)
        # numpy reference (C semantics)
        dd = _np_dense(raw_in, x, d, feats)
        hv = _np_gru(raw_vg, d, v, dd, hv)
        vad_np = _np_dense(raw_vad, v, 1, hv)[0]
        hn = _np_gru(raw_ng, d + v + x, nz, np.concatenate([dd, hv, feats]),
                     hn)
        hd = _np_gru(raw_dg, v + nz + x, dn,
                     np.concatenate([hv, hn, feats]), hd)
        gains_np = _np_dense(raw_out, dn, g, hd)
        # JAX network
        state, gains, vad = rnnoise_model.rnn_step(params, state, feats)
        np.testing.assert_allclose(np.asarray(gains), gains_np,
                                   rtol=1e-4, atol=1e-5)
        assert float(vad) == pytest.approx(float(vad_np), abs=1e-5)


def test_rnnoise_sequence_matches_stepwise(tmp_path):
    rng = np.random.default_rng(5)
    text, _ = _build_model_text(rng)
    params = rnnoise_model.parse_model_file(text)
    feats = rng.standard_normal((6, 42)).astype(np.float32)
    s1 = rnnoise_model.init_rnn_state(params)
    step_gains = []
    for f in feats:
        s1, gains, _ = rnnoise_model.rnn_step(params, s1, f)
        step_gains.append(np.asarray(gains))
    s2 = rnnoise_model.init_rnn_state(params)
    _, seq_gains, _ = rnnoise_model.rnn_sequence(params, s2, feats)
    # scan compiles; eager doesn't — summation-order noise compounds
    # through 6 recurrent frames with ±0.5-scale random weights.
    np.testing.assert_allclose(np.asarray(seq_gains),
                               np.stack(step_gains), rtol=5e-3, atol=5e-4)


def test_rnnoise_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    text, _ = _build_model_text(rng)
    params = rnnoise_model.parse_model_file(text)
    path = str(tmp_path / "rnnoise.npz")
    rnnoise_model.save_npz(params, path)
    back = rnnoise_model.load_npz(path)
    for layer in params:
        for k in params[layer]:
            np.testing.assert_array_equal(np.asarray(params[layer][k]),
                                          np.asarray(back[layer][k]))


def test_rnnoise_rejects_bad_header():
    with pytest.raises(ValueError, match="not an RNNoise"):
        rnnoise_model.parse_model_file("some other file\n1 2 3")


def test_rnnoise_rejects_inconsistent_topology():
    rng = np.random.default_rng(3)
    parts = ["rnnoise-nu model file version 1"]
    parts.append(_dense_text(42, 24, rng)[0])
    parts.append(_gru_text(24, 24, rng)[0])
    parts.append(_gru_text(50, 48, rng)[0])   # wrong concat width
    parts.append(_gru_text(114, 96, rng)[0])
    parts.append(_dense_text(96, 22, rng)[0])
    parts.append(_dense_text(24, 1, rng)[0])
    with pytest.raises(ValueError, match="noise_gru"):
        rnnoise_model.parse_model_file("\n".join(parts))
