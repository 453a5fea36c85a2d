"""CLI integration tests driving the real entry point in a subprocess —
port of the reference's tests/cli_integration.rs strategy (help/version/
invalid input/no-daemon paths, no model or audio hardware required)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)   # the axon sitecustomize
    # force-registers the TPU tunnel when this is set, overriding
    # JAX_PLATFORMS=cpu — subprocess tests must really run on CPU
    env["OPENHUSH_NO_FALLBACK"] = "1"   # skip the temperature ladder
    return subprocess.run(
        [sys.executable, "-m", "openhush_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=env)


def test_help():
    r = run_cli("--help")
    assert r.returncode == 0
    for cmd in ("transcribe", "model", "start", "stop", "status", "record",
                "service", "secret", "summarize"):
        assert cmd in r.stdout


def test_version():
    r = run_cli("--version")
    assert r.returncode == 0
    assert "openhush-tpu" in r.stdout


def test_model_list():
    r = run_cli("model", "list")
    assert r.returncode == 0
    for m in ("tiny", "base", "small", "medium", "large-v3"):
        assert m in r.stdout


def test_transcribe_missing_file():
    r = run_cli("transcribe", "/nonexistent.wav")
    assert r.returncode == 1
    assert "File not found" in r.stderr


def test_transcribe_missing_model(tmp_path, monkeypatch):
    from openhush_tpu.audio.wav import save_wav
    p = str(tmp_path / "a.wav")
    save_wav(p, np.zeros(16000, np.float32))
    # Isolate from any converted checkpoints on this machine.
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path / "empty"))
    r = run_cli("transcribe", p, "--model", "tiny")
    assert r.returncode == 1
    assert "Model not found" in r.stderr


@pytest.mark.slow
def test_transcribe_json_random_init(tmp_path):
    """End-to-end: WAV → JSON with the reference's exact key set
    (src/main.rs:1028-1036)."""
    from openhush_tpu.audio.wav import save_wav
    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    p = str(tmp_path / "b.wav")
    save_wav(p, audio)
    # 36 s standalone, but the fresh-process jax compile can crawl when
    # the nightly suite saturates the host — give it slack.
    r = run_cli("transcribe", p, "--model", "test", "--random-init",
                "--dtype", "float32", "--format", "json", timeout=1200)
    assert r.returncode == 0, r.stderr
    payload = r.stdout[r.stdout.index("{"):]
    data = json.loads(payload)
    assert set(data) == {"text", "language", "duration_ms",
                         "audio_duration_secs", "transcription_time_ms",
                         "real_time_factor", "model"}
    assert data["model"] == "test"
    assert data["real_time_factor"] > 0


def test_all_advertised_commands_dispatch(tmp_path):
    """Every subcommand in --help must resolve to a real handler (the
    'not available yet' stub path should be dead)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)   # the axon sitecustomize
    # force-registers the TPU tunnel when this is set, overriding
    # JAX_PLATFORMS=cpu — subprocess tests must really run on CPU
    env["HOME"] = str(tmp_path)
    env["XDG_CONFIG_HOME"] = str(tmp_path / ".config")
    env["OPENHUSH_CONFIG"] = str(tmp_path / "config.toml")
    env.pop("EDITOR", None)
    env.pop("VISUAL", None)
    r = subprocess.run(
        [sys.executable, "-m", "openhush_tpu.cli", "preferences"],
        capture_output=True, text=True, timeout=120, env=env)
    assert r.returncode == 0
    assert "config.toml" in r.stdout
    assert "not available yet" not in r.stderr


@pytest.mark.slow
def test_transcribe_multiple_files_batch(tmp_path):
    """Batch-file transcription (baseline config #2): several short files
    in one invocation through the batching server."""
    from openhush_tpu.audio.wav import save_wav
    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.wav")
        save_wav(p, (0.2 * rng.standard_normal(16000)).astype(np.float32))
        paths.append(p)
    r = run_cli("transcribe", *paths, "--model", "test", "--random-init",
                "--dtype", "float32", "--format", "json")
    assert r.returncode == 0, r.stderr
    payload = r.stdout[r.stdout.index("["):]
    data = json.loads(payload)
    assert len(data) == 3
    assert all("file" in d and "real_time_factor" in d for d in data)


@pytest.mark.slow
def test_transcribe_multiple_files_beam(tmp_path):
    """--beam-size with several files runs concurrent beam GROUPS through
    the beam server instead of degrading to one-shot-per-file."""
    from openhush_tpu.audio.wav import save_wav
    rng = np.random.default_rng(2)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"b{i}.wav")
        save_wav(p, (0.2 * rng.standard_normal(16000)).astype(np.float32))
        paths.append(p)
    r = run_cli("transcribe", *paths, "--model", "test", "--random-init",
                "--dtype", "float32", "--beam-size", "2",
                "--format", "json")
    assert r.returncode == 0, r.stderr
    payload = r.stdout[r.stdout.index("["):]
    data = json.loads(payload)
    assert len(data) == 2
    assert all("file" in d and "real_time_factor" in d for d in data)


def test_model_name_traversal_rejected(tmp_path, monkeypatch):
    """`model remove/download` must refuse names that escape the model
    dir (ADVICE r2: '../..' drove rmtree outside it)."""
    from openhush_tpu import cli

    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path))
    victim = tmp_path.parent / "victim"
    victim.mkdir(exist_ok=True)
    (victim / "keep.txt").write_text("x")
    for bad in ("../../victim", "..", "a/b", "a\\b", "hf/../x"):
        assert cli.main(["model", "remove", bad]) == 1
        assert cli.main(["model", "download", bad]) == 1
    assert (victim / "keep.txt").exists()
    assert cli._safe_model_name("large-v3")
    assert cli._safe_model_name("large-v3-turbo")
