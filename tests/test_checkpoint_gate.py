"""Offline dry-run of the real-checkpoint gate (VERDICT r2 #5): every
stage of tools/checkpoint_gate.py — convert, parity, WER (engine + int8
serving path), int8 decision, M2M-100, all aux families — executes end
to end on synthetic checkpoints, so the networked run is execute-only."""

import json
import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_offline_dryrun(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               # the axon sitecustomize force-registers the TPU tunnel
               # when this is set, overriding JAX_PLATFORMS=cpu
               PALLAS_AXON_POOL_IPS="",
               OPENHUSH_MODEL_DIR=str(tmp_path / "models"),
               OPENHUSH_CONFIG=str(tmp_path / "config.toml"))
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "checkpoint_gate.py"),
         "--offline-dryrun", "--work", str(tmp_path / "work")],
        env=env, capture_output=True, text=True, timeout=3600)
    sys.stdout.write(rc.stdout[-2000:])
    assert rc.returncode == 0, rc.stdout[-1500:] + rc.stderr[-1500:]
    report = json.loads(
        (tmp_path / "work" / "gate_report.json").read_text())
    assert report["ok"]
    expected = {"whisper_convert", "whisper_parity", "wer_bf16",
                "wer_int8_self", "wer_beam_bf16", "wer_beam_int8",
                "int8_decision", "wer_gelu_tanh",
                "gelu_decision", "wer_int8_rung", "int8_rung_decision",
                "wer_int8_encoder", "int8_encoder_decision",
                "spec_accept_rate", "m2m100_convert", "aux_convert",
                "silero_sanity", "diarization_der"}
    assert expected <= set(report["stages"])
    for name in expected:
        assert report["stages"][name]["ok"], (name,
                                              report["stages"][name])
    # Random-init dryrun must NEVER flip the int8 or GELU defaults.
    assert report["stages"]["int8_decision"]["detail"][
        "default_flipped"] is False
    assert not (tmp_path / "models" / "int8_self_cache.ok").exists()
    assert report["stages"]["gelu_decision"]["detail"][
        "default_flipped"] is False
    assert not (tmp_path / "models" / "gelu_tanh.ok").exists()
    assert report["stages"]["int8_rung_decision"]["detail"][
        "default_flipped"] is False
    assert report["stages"]["int8_encoder_decision"]["detail"][
        "default_flipped"] is False
    assert not (tmp_path / "models" / "int8_encoder.ok").exists()
    assert not (tmp_path / "models" / "int8_rung.ok").exists()
    # Accept-rate stage measures a real number in [0, 1] + the projected
    # tokens/iteration the spec policy consumes.
    acc = report["stages"]["spec_accept_rate"]["detail"]
    assert 0.0 <= acc["accept"] <= 1.0 and acc["positions"] > 0
    assert 1.0 <= acc["expected_tokens_per_iter_k4"] <= 4.0
    der = report["stages"]["diarization_der"]["detail"]
    assert 0.0 <= der["der"] <= 2.0
