"""CLI subcommand tests: config get/set, secret store, api-key, service,
summarize — driven through the real CLI in isolated HOME/XDG dirs."""

import json
import os
import subprocess
import sys

import pytest


# Heavy end-to-end module: excluded from the bounded core lane
# (`pytest -m "not slow"`, CI PR job); the nightly full-suite job
# and OPENHUSH_TEST_TPU runs include it.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def env(tmp_path):
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    e["JAX_PLATFORMS"] = "cpu"
    e.pop("PALLAS_AXON_POOL_IPS", None)   # the axon sitecustomize
    # force-registers the TPU tunnel when this is set, overriding
    # JAX_PLATFORMS=cpu — subprocess tests must really run on CPU
    e["HOME"] = str(tmp_path)
    e["XDG_CONFIG_HOME"] = str(tmp_path / ".config")
    e["XDG_DATA_HOME"] = str(tmp_path / ".local" / "share")
    e["OPENHUSH_CONFIG"] = str(tmp_path / "config.toml")
    return e


def run_cli(env, *args, stdin=None, timeout=120):
    return subprocess.run(
        [sys.executable, "-m", "openhush_tpu.cli", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        input=stdin)


def test_config_show_and_path(env):
    r = run_cli(env, "config", "show")
    assert r.returncode == 0
    assert "[transcription]" in r.stdout
    assert "model" in r.stdout
    r = run_cli(env, "config", "path")
    assert r.stdout.strip() == env["OPENHUSH_CONFIG"]


def test_config_set_get_roundtrip(env):
    r = run_cli(env, "config", "set", "transcription.model", "small")
    assert r.returncode == 0, r.stderr
    r = run_cli(env, "config", "get", "transcription.model")
    assert r.stdout.strip() == "small"
    # Persisted to disk.
    assert os.path.exists(env["OPENHUSH_CONFIG"])
    r = run_cli(env, "config", "validate")
    assert "valid" in r.stdout


def test_config_set_rejects_invalid(env):
    r = run_cli(env, "config", "set", "transcription.model", "nonexistent")
    assert r.returncode == 1
    assert "unknown model" in r.stderr
    r = run_cli(env, "config", "set", "bogus.key", "1")
    assert r.returncode == 1


def test_config_set_bool_and_int(env):
    r = run_cli(env, "config", "set", "api.enabled", "true")
    assert r.returncode == 0
    r = run_cli(env, "config", "set", "api.port", "9999")
    assert r.returncode == 0
    r = run_cli(env, "config", "get", "api.port")
    assert r.stdout.strip() == "9999"


def test_secret_store_cycle(env):
    r = run_cli(env, "secret", "set", "mykey", "myvalue")
    assert r.returncode == 0, r.stderr
    r = run_cli(env, "secret", "get", "mykey")
    assert r.stdout.strip() == "myvalue"
    r = run_cli(env, "secret", "list")
    assert "mykey" in r.stdout
    r = run_cli(env, "secret", "delete", "mykey")
    assert r.returncode == 0
    r = run_cli(env, "secret", "get", "mykey")
    assert r.returncode == 1
    # File store must be 0600.
    path = os.path.join(env["XDG_DATA_HOME"], "openhush-tpu",
                        "secrets.json")
    assert oct(os.stat(path).st_mode & 0o777) == "0o600"


def test_api_key_generate(env):
    r = run_cli(env, "api-key", "generate")
    assert r.returncode == 0
    key = r.stdout.strip().splitlines()[-1]
    r = run_cli(env, "config", "get", "api.api_key_hash")
    stored_hash = r.stdout.strip()
    from openhush_tpu.api.server import hash_api_key
    assert hash_api_key(key) == stored_hash
    r = run_cli(env, "api-key", "clear")
    assert r.returncode == 0
    r = run_cli(env, "config", "get", "api.api_key_hash")
    assert r.stdout.strip() == ""


def test_service_install_status_uninstall(env):
    r = run_cli(env, "service", "install")
    assert r.returncode == 0
    unit = os.path.join(env["XDG_CONFIG_HOME"], "systemd", "user",
                        "openhush.service")
    if sys.platform != "darwin":
        assert os.path.exists(unit)
        content = open(unit).read()
        assert "openhush_tpu.cli start" in content
    r = run_cli(env, "service", "status")
    assert "Installed: True" in r.stdout
    r = run_cli(env, "service", "uninstall")
    assert r.returncode == 0
    r = run_cli(env, "service", "status")
    assert "Installed: False" in r.stdout


def test_summarize_no_provider(env):
    # Point at a dead Ollama → clear error, not a crash.
    run_cli(env, "config", "set", "summarization.ollama_url",
            "http://127.0.0.1:1")
    r = run_cli(env, "summarize", stdin="we talked about things")
    assert r.returncode == 1
    assert "not available" in r.stderr


def test_summarize_list_templates(env):
    r = run_cli(env, "summarize", "--list-templates")
    assert r.returncode == 0
    for t in ("summary", "meeting", "standup", "retro", "1on1"):
        assert t in r.stdout


def test_device_set_and_channels(tmp_path, monkeypatch, capsys):
    """DeviceAction::Set/Channels parity (src/main.rs:332-343)."""
    from openhush_tpu.runtime.daemon import cmd_device
    from openhush_tpu.utils.config import Config

    monkeypatch.setenv("OPENHUSH_CONFIG", str(tmp_path / "c.toml"))
    assert cmd_device(["set", "USB Mic"]) == 0
    assert cmd_device(["channels", "0,2"]) == 0
    cfg = Config.load_or_default()
    assert cfg.audio.device == "USB Mic"
    assert cfg.audio.channels == [0, 2]
    assert cmd_device(["channels", "all"]) == 0
    assert Config.load_or_default().audio.channels == []
    assert cmd_device(["channels", "x,y"]) == 2
    assert cmd_device(["list", "--format", "json"]) == 0
    import json as _json
    assert isinstance(_json.loads(capsys.readouterr().out.strip()
                                  .splitlines()[-1]), list)
