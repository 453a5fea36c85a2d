"""Golden-file schema-parity test: the REFERENCE's own config.example.toml
(verbatim fixture: tests/data/reference_config_golden.toml, from
/root/reference/config.example.toml — a schema-mandated public config
example, kept byte-identical so drift is detectable) must load without
errors, map onto our semantics, and round-trip through save/load.

Reference schema cites: src/config.rs:899-908 ([gpu]), feedback +
summarization.{ollama,openai} sections in src/config.rs, [output]
clipboard/paste booleans, [queue] max_pending=0 (unlimited) + separator.
"""

import os

import pytest

from openhush_tpu.utils.config import Config

GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "reference_config_golden.toml")


@pytest.fixture
def cfg():
    return Config.load_or_default(GOLDEN)


def test_loads_without_validation_errors(cfg):
    assert cfg.validate() == []


def test_core_sections_mapped(cfg):
    assert cfg.hotkey.key == "ControlRight"
    assert cfg.hotkey.mode == "push_to_talk"
    assert cfg.transcription.model == "small"
    assert cfg.transcription.language == "auto"
    assert cfg.transcription.translate is False
    assert cfg.transcription.device == "cuda"   # accepted verbatim


def test_output_booleans_map_to_mode(cfg):
    # clipboard = true + paste = true → both
    assert cfg.output.mode == "both"
    assert cfg.output.clipboard and cfg.output.paste


def test_queue_reference_semantics(cfg):
    assert cfg.queue.max_pending == 0          # 0 = unlimited
    assert cfg.queue.separator == " "


def test_correction_alias(cfg):
    assert cfg.correction.enabled is False
    assert cfg.correction.ollama_url == "http://localhost:11434"
    assert cfg.correction.model == "llama3.2:3b"   # via ollama_model alias


def test_feedback_section(cfg):
    assert cfg.feedback.audio is True
    assert cfg.feedback.visual is True


def test_gpu_section(cfg):
    assert cfg.gpu.auto_detect is True
    assert cfg.gpu.devices == []


def test_summarization_nested_tables(cfg):
    s = cfg.summarization
    assert s.enabled is True
    assert s.provider == "ollama"              # via default_provider
    assert s.default_template == "meeting"
    assert s.ollama_url == "http://localhost:11434"
    assert s.model == "llama3.2:3b"
    assert s.ollama_timeout_secs == 120
    assert s.api_key == "keyring:openai-api"
    assert s.openai_model == "gpt-4o-mini"
    assert s.openai_url == "https://api.openai.com/v1"
    assert s.openai_timeout_secs == 120


def test_round_trip_preserves_semantics(cfg, tmp_path):
    out = tmp_path / "config.toml"
    cfg.save(str(out))
    back = Config.load_or_default(str(out))
    assert back.validate() == []
    assert back.output.mode == "both"
    assert back.queue.max_pending == 0
    assert back.correction.model == "llama3.2:3b"
    assert back.summarization.provider == "ollama"
    assert back.summarization.openai_url == "https://api.openai.com/v1"
    assert back.hotkey.key == "ControlRight"


def test_unknown_sections_preserved(tmp_path):
    src = tmp_path / "in.toml"
    src.write_text(open(GOLDEN).read()
                   + '\n[future_section]\nsome_key = "kept"\n')
    cfg = Config.load_or_default(str(src))
    out = tmp_path / "out.toml"
    cfg.save(str(out))
    back = Config.load_or_default(str(out))
    assert back.extra["future_section"]["some_key"] == "kept"


def test_golden_file_matches_reference():
    """The fixture must stay byte-identical to the reference's example
    when the reference tree is present (dev machines)."""
    ref = "/root/reference/config.example.toml"
    if not os.path.exists(ref):
        pytest.skip("reference tree not mounted")
    assert open(GOLDEN, "rb").read() == open(ref, "rb").read()
