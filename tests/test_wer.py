"""WER harness tests: alignment counts, normalization, LibriSpeech layout."""

import numpy as np
import pytest

from openhush_tpu.utils import wer as W


def test_wer_identical():
    r = W.wer("hello world", "hello world")
    assert r.wer == 0.0 and r.errors == 0 and r.n_ref_words == 2


def test_wer_substitution():
    r = W.wer("the cat sat", "the dog sat")
    assert r.substitutions == 1 and r.deletions == 0 and r.insertions == 0
    assert r.wer == pytest.approx(1 / 3)


def test_wer_deletion_insertion():
    r = W.wer("a b c d", "a c d")
    assert r.deletions == 1 and r.wer == pytest.approx(0.25)
    r = W.wer("a c d", "a b c d")
    assert r.insertions == 1 and r.wer == pytest.approx(1 / 3)


def test_wer_empty_cases():
    assert W.wer("", "").wer == 0.0
    assert W.wer("", "something").wer == 1.0
    assert W.wer("ref words here", "").wer == 1.0


def test_normalization_folds_formatting():
    r = W.wer("Hello, World!", "hello world")
    assert r.wer == 0.0
    r = W.wer("I can't go", "i can not go")
    assert r.wer == 0.0
    # Without normalization they differ.
    r = W.wer("Hello, World!", "hello world", normalize=False)
    assert r.wer > 0


def test_aggregate():
    rs = [W.wer("a b", "a b"), W.wer("c d", "c x")]
    agg = W.aggregate(rs)
    assert agg.n_ref_words == 4
    assert agg.wer == pytest.approx(0.25)


def test_librispeech_layout(tmp_path):
    from openhush_tpu.audio.wav import save_wav
    d = tmp_path / "19" / "198"
    d.mkdir(parents=True)
    save_wav(str(d / "19-198-0000.wav"), np.zeros(16000, np.float32))
    save_wav(str(d / "19-198-0001.wav"), np.zeros(16000, np.float32))
    (d / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO THERE\n19-198-0001 SECOND UTTERANCE\n")
    items = list(W.iter_librispeech(str(tmp_path)))
    assert len(items) == 2
    assert items[0][1] in ("HELLO THERE", "SECOND UTTERANCE")


class _EchoEngine:
    """Fake engine returning a constant hypothesis."""

    def transcribe(self, audio, language="en"):
        import types
        return types.SimpleNamespace(text="hello there")


def test_evaluate_librispeech(tmp_path):
    from openhush_tpu.audio.wav import save_wav
    d = tmp_path / "x" / "y"
    d.mkdir(parents=True)
    save_wav(str(d / "x-y-0000.wav"), np.zeros(16000, np.float32))
    (d / "x-y.trans.txt").write_text("x-y-0000 HELLO THERE\n")
    agg = W.evaluate_librispeech(_EchoEngine(), str(tmp_path),
                                 progress=False)
    assert agg.wer == 0.0
    assert agg.n_ref_words == 2
