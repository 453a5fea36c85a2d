"""DER/JER harness (utils/der.py — VERDICT r2 #6). Metric unit tests
run everywhere; the synthetic-meeting end-to-end eval is slow-marked."""

import numpy as np
import pytest

from openhush_tpu.utils.der import (DerResult, Turn, aggregate, der,
                                    evaluate_synthetic_meetings,
                                    synth_meeting)


def test_perfect_hypothesis_zero_der():
    ref = [Turn(0.0, 2.0, "A"), Turn(3.0, 5.0, "B")]
    hyp = [Turn(0.0, 2.0, "x"), Turn(3.0, 5.0, "y")]
    r = der(ref, hyp)
    assert r.der == 0.0 and r.jer == 0.0


def test_label_permutation_is_free():
    """Optimal mapping: swapped hypothesis labels cost nothing."""
    ref = [Turn(0.0, 2.0, "A"), Turn(3.0, 5.0, "B")]
    hyp = [Turn(0.0, 2.0, "y"), Turn(3.0, 5.0, "x")]
    assert der(ref, hyp).der == 0.0


def test_missed_speech():
    ref = [Turn(0.0, 4.0, "A")]
    hyp = [Turn(0.0, 2.0, "x")]
    r = der(ref, hyp, collar=0.0)
    assert r.missed == pytest.approx(0.5, abs=0.02)
    assert r.false_alarm == 0.0 and r.confusion == 0.0


def test_false_alarm():
    ref = [Turn(0.0, 2.0, "A")]
    hyp = [Turn(0.0, 4.0, "x")]
    r = der(ref, hyp, collar=0.0)
    assert r.false_alarm == pytest.approx(1.0, abs=0.05)


def test_confusion_single_speaker_swap():
    """One ref speaker transcribed as two hyp speakers: the smaller half
    is confusion."""
    ref = [Turn(0.0, 4.0, "A")]
    hyp = [Turn(0.0, 3.0, "x"), Turn(3.0, 4.0, "y")]
    r = der(ref, hyp, collar=0.0)
    assert r.confusion == pytest.approx(0.25, abs=0.02)
    assert r.der == pytest.approx(0.25, abs=0.02)


def test_collar_forgives_boundary_jitter():
    ref = [Turn(1.0, 3.0, "A")]
    hyp = [Turn(1.1, 2.9, "x")]
    assert der(ref, hyp, collar=0.25).der == 0.0
    assert der(ref, hyp, collar=0.0).der > 0.0


def test_overlap_scoring():
    """Overlapped speech counts per active speaker."""
    ref = [Turn(0.0, 2.0, "A"), Turn(1.0, 2.0, "B")]   # 3s of speech
    hyp = [Turn(0.0, 2.0, "x")]                         # misses B
    r = der(ref, hyp, collar=0.0)
    assert r.missed == pytest.approx(1 / 3, abs=0.03)


def test_aggregate_weighted():
    a = DerResult(0.0, 0.0, 0.0, 0.0, 0.0, ref_speech_secs=10.0)
    b = DerResult(0.3, 0.3, 0.1, 0.1, 0.1, ref_speech_secs=30.0)
    agg = aggregate([a, b])
    assert agg.der == pytest.approx(0.225)
    assert agg.ref_speech_secs == 40.0


def test_synth_meeting_structure():
    rng = np.random.default_rng(0)
    audio, turns = synth_meeting(rng, 3, secs=10.0)
    assert audio.shape == (160000,)
    assert np.isfinite(audio).all()
    assert len({t.speaker for t in turns}) >= 2
    assert all(0 <= t.start < t.end <= 10.0 for t in turns)


@pytest.mark.slow
def test_end_to_end_der_improves_with_training(tmp_path, monkeypatch):
    """Quality gate: a trained segmentation+embedder must beat the
    random-init engine on the synthetic-meeting DER by a clear margin
    (the metricized version of the round-2 two-speaker clustering test)."""
    import jax

    from openhush_tpu.models.diarization import DiarizationEngine
    from openhush_tpu.training import speaker as sp

    random_engine = DiarizationEngine()      # random-init embedder
    base = evaluate_synthetic_meetings(random_engine, n_meetings=3,
                                       seed=1, secs=12.0)

    emb = sp.train_embedder(seed=0, steps=120, n_speakers=8)
    seg = sp.train_segmentation(seed=0, steps=120)
    trained = DiarizationEngine(params=emb, seg_params=seg)
    got = evaluate_synthetic_meetings(trained, n_meetings=3, seed=1,
                                      secs=12.0)
    assert np.isfinite(got.der)
    assert got.der < base.der - 0.05, (got, base)


def test_from_local_uses_packaged_checkpoints(tmp_path, monkeypatch):
    """With an empty model dir, from_local falls back to the committed
    assets (openhush_tpu/assets/diarization) — diarization quality out
    of the box, no downloads."""
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path))
    from openhush_tpu.models.diarization import DiarizationEngine
    eng = DiarizationEngine.from_local()
    assert eng.seg_params is not None     # packaged segmentation net


def test_rttm_roundtrip(tmp_path):
    from openhush_tpu.utils.der import Turn, load_rttm, write_rttm
    turns = [Turn(0.5, 2.25, 0), Turn(2.0, 4.0, 1)]
    p = str(tmp_path / "m.rttm")
    write_rttm(p, "m", turns)
    back = load_rttm(p)
    assert [(t.start, t.end) for t in back] == [(0.5, 2.25), (2.0, 4.0)]
    assert [t.speaker for t in back] == ["spk0", "spk1"]


class _FakeSeg:
    def __init__(self, s, e, k):
        self.start_secs, self.end_secs, self.speaker_id = s, e, k


class _FakeDiarizer:
    """Emits one full-chunk turn for speaker 0 — perfect against a
    single-speaker reference."""

    def __init__(self):
        self.reset_calls = 0

    def reset(self):
        self.reset_calls += 1

    def diarize_chunk(self, audio, offset_secs=0.0):
        dur = len(audio) / 16000.0
        return [_FakeSeg(offset_secs, offset_secs + dur, 0)]


def test_evaluate_rttm_dataset_limit_counts_pairs(tmp_path):
    """Stray wavs without a matching .rttm must not consume the limit
    (AMI audio whose references weren't fetched sorts first)."""
    from openhush_tpu.audio.wav import save_wav
    from openhush_tpu.utils.der import (Turn, evaluate_rttm_dataset,
                                        write_rttm)
    sr = 16000
    audio = np.zeros(sr * 2, np.float32)
    # 3 stray wavs sorting BEFORE the 2 paired ones.
    for name in ("a_stray1", "a_stray2", "a_stray3"):
        save_wav(str(tmp_path / f"{name}.wav"), audio)
    for name in ("z_pair1", "z_pair2"):
        save_wav(str(tmp_path / f"{name}.wav"), audio)
        write_rttm(str(tmp_path / f"{name}.rttm"), name,
                   [Turn(0.0, 2.0, 0)])
    eng = _FakeDiarizer()
    res = evaluate_rttm_dataset(str(tmp_path), engine=eng, limit=2)
    assert eng.reset_calls == 2          # both pairs evaluated
    assert res.der == pytest.approx(0.0, abs=1e-6)


def test_evaluate_rttm_dataset_empty_raises(tmp_path):
    from openhush_tpu.utils.der import evaluate_rttm_dataset
    with pytest.raises(FileNotFoundError):
        evaluate_rttm_dataset(str(tmp_path), engine=_FakeDiarizer())
