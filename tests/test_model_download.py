"""`model download/remove/load/unload` CLI actions (parity:
ModelAction::Download/List/Remove/Load/Unload, src/main.rs:300-321, and
the Range-resume download path src/engine/whisper.rs:456-598).

Download is tested against a local HTTP server staging a synthetic HF
checkpoint (real safetensors file, HF tensor names) — the same fetch →
convert → npz pipeline real checkpoints take."""

import http.server
import os
import sys
import threading

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from openhush_tpu import cli  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def hf_site(tmp_path_factory):
    """Local HTTP tree: /test/model.safetensors + config.json."""
    root = tmp_path_factory.mktemp("hfsite")
    model_dir = root / "test"
    model_dir.mkdir()
    hf_cfg = transformers.WhisperConfig(
        vocab_size=51865, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=256, encoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None)
    torch.manual_seed(3)
    model = transformers.WhisperForConditionalGeneration(hf_cfg).eval()
    from safetensors.numpy import save_file
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_file(sd, str(model_dir / "model.safetensors"))
    (model_dir / "config.json").write_text(hf_cfg.to_json_string())

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(root), **kw)
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}/{{name}}"
    httpd.shutdown()


def test_download_convert_remove_cycle(hf_site, tmp_path, monkeypatch):
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path / "models"))
    rc = cli.main(["model", "download", "test",
                   "--base-url", hf_site])
    assert rc == 0
    npz = tmp_path / "models" / "test.npz"
    assert npz.exists()

    # The converted checkpoint actually loads and runs.
    from openhush_tpu.runtime.engine import WhisperEngine
    eng = WhisperEngine(model="test", dtype="float32", language="en")
    audio = (0.2 * np.random.default_rng(0)
             .standard_normal(16000)).astype(np.float32)
    assert eng.transcribe(audio) is not None

    # Re-download is a no-op (files cached), then remove cleans up.
    assert cli.main(["model", "download", "test",
                     "--base-url", hf_site]) == 0
    assert cli.main(["model", "remove", "test"]) == 0
    assert not npz.exists()
    assert not (tmp_path / "models" / "hf" / "test").exists()
    assert cli.main(["model", "remove", "test"]) == 0  # idempotent


def test_download_bad_url_fails_cleanly(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path / "models"))
    rc = cli.main(["model", "download", "test",
                   "--base-url", "http://127.0.0.1:9/{name}"])
    assert rc == 1
    assert "download failed" in capsys.readouterr().err


def test_load_unload_without_daemon(monkeypatch, capsys):
    monkeypatch.delenv("DBUS_SESSION_BUS_ADDRESS", raising=False)
    monkeypatch.setenv("XDG_RUNTIME_DIR", "/nonexistent-xdg")
    rc = cli.main(["model", "load"])
    assert rc == 1
    assert "Daemon not running" in capsys.readouterr().err
