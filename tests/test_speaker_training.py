"""Speaker-model training recipes: the proof that diarization is
voice-discriminative with in-tree training alone (VERDICT item: two
synthetic speakers with distinct spectral envelopes must cluster into 2).
Reference capability being matched: pretrained segmentation-3.0 +
wespeaker embeddings, src/diarization/mod.rs:248-338."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from openhush_tpu.models.diarization import (DiarizationConfig,
                                             DiarizationEngine,
                                             EmbeddingClusterer, SEG_K,
                                             segmentation_activities,
                                             speaker_embedding)
from openhush_tpu.training import speaker as sp

N_FRAMES = 100
N_SAMP = N_FRAMES * 160


@pytest.fixture(scope="module")
def embedder_params():
    return sp.train_embedder(seed=0, n_speakers=8, steps=200, batch=24)


@pytest.fixture(scope="module")
def seg_params():
    return sp.train_segmentation(seed=0, steps=250, batch=12, pool_size=48)


def _embed(params, audio):
    return np.asarray(speaker_embedding(params, jnp.asarray(audio),
                                        n_frames=N_FRAMES))


def test_two_unseen_speakers_cluster_into_two(embedder_params):
    """Speakers NOT in the training bank; default 0.6 threshold."""
    rng = np.random.default_rng(99)
    bank = sp.synth_speaker_bank(rng, 2)
    embs = {s: [_embed(embedder_params,
                       sp.synth_utterance(rng, bank[s], N_SAMP))
                for _ in range(6)] for s in (0, 1)}
    within = np.mean([e1 @ e2 for s in (0, 1)
                      for e1, e2 in itertools.combinations(embs[s], 2)])
    between = np.mean([e1 @ e2 for e1 in embs[0] for e2 in embs[1]])
    assert within > 0.7, f"within-speaker similarity too low: {within}"
    assert between < 0.4, f"between-speaker similarity too high: {between}"

    cl = EmbeddingClusterer(DiarizationConfig())       # threshold 0.6
    ids = [cl.assign(e) for s in (0, 1) for e in embs[s]]
    assert cl.n_speakers == 2
    assert ids[:6] == [0] * 6 and ids[6:] == [1] * 6


def test_segmentation_learns_speech_frames(seg_params):
    rng = np.random.default_rng(7)
    bank = sp.synth_speaker_bank(rng, 4)               # unseen voices
    accs = []
    for _ in range(8):
        audio, labels = sp.synth_mixture(rng, bank)
        mel = sp._mel_batch(audio[None], 400)
        acts = np.asarray(segmentation_activities(seg_params, mel)[0])
        pred = acts.max(axis=1) >= 0.5
        true = labels.max(axis=1) >= 0.5
        accs.append(float((pred == true).mean()))
    assert np.mean(accs) > 0.9, f"speech-frame accuracy {np.mean(accs)}"


def test_segmentation_activity_shape():
    params = sp.train_segmentation(seed=1, steps=1, batch=2, pool_size=2)
    mel = jnp.zeros((2, 400, 80))
    acts = segmentation_activities(params, mel)
    assert acts.shape == (2, 100, SEG_K)
    assert float(acts.min()) >= 0.0 and float(acts.max()) <= 1.0


def test_engine_end_to_end_two_speakers(embedder_params, seg_params):
    """A-silence-B-silence-A conversation → segmentation finds the turns,
    clustering maps both A turns to one id and B to another."""
    rng = np.random.default_rng(31)
    bank = sp.synth_speaker_bank(rng, 2)
    sr = 16000
    gap = np.zeros(int(0.6 * sr), np.float32)
    a1 = sp.synth_utterance(rng, bank[0], int(1.2 * sr))
    b1 = sp.synth_utterance(rng, bank[1], int(1.2 * sr))
    a2 = sp.synth_utterance(rng, bank[0], int(1.2 * sr))
    audio = np.concatenate([gap, a1, gap, b1, gap, a2, gap])

    eng = DiarizationEngine(params=embedder_params, seg_params=seg_params)
    segments = eng.diarize_chunk(audio)
    assert len(segments) >= 3, segments
    # Order-of-time speaker ids: first and last turns are the same voice,
    # the middle one differs.
    segments.sort(key=lambda s: s.start_secs)
    ids = [s.speaker_id for s in segments]
    assert ids[0] == ids[-1], f"A turns split: {segments}"
    assert ids[0] != ids[len(ids) // 2], f"A/B merged: {segments}"
    assert eng.clusterer.n_speakers == 2


def test_training_is_deterministic():
    p1 = sp.train_embedder(seed=3, n_speakers=3, steps=2, batch=4,
                           utts_per_speaker=2)
    p2 = sp.train_embedder(seed=3, n_speakers=3, steps=2, batch=4,
                           utts_per_speaker=2)
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]),
                                      np.asarray(p2[k]))


def test_powerset_marginalization():
    from openhush_tpu.models.diarization import powerset_to_activities
    probs = np.zeros((4, 7), np.float32)
    probs[0, 0] = 1.0            # silence
    probs[1, 1] = 1.0            # {0}
    probs[2, 4] = 1.0            # {0,1} overlap
    probs[3, 6] = 1.0            # {1,2} overlap
    acts = powerset_to_activities(probs)
    np.testing.assert_allclose(acts[0], [0, 0, 0])
    np.testing.assert_allclose(acts[1], [1, 0, 0])
    np.testing.assert_allclose(acts[2], [1, 1, 0])
    np.testing.assert_allclose(acts[3], [0, 1, 1])


def test_pyannote_style_onnx_segmentation(tmp_path, monkeypatch):
    """A synthetic powerset-output ONNX graph (the segmentation-3.0
    contract: waveform [1,1,N] → log-softmax [1,T,7]) drives
    segment_regions through from_local: loud frames → speaker-0 region."""
    from openhush_tpu.models.diarization import DiarizationEngine
    from openhush_tpu.utils import onnx_io
    from openhush_tpu.utils.onnx_io import (OnnxGraph, OnnxModel, OnnxNode,
                                            OnnxValueInfo)

    n, hop = 6400, 160              # 0.4 s, 40 frames
    frames = n // hop
    w = np.zeros((1, 7), np.float32)
    w[0, 0], w[0, 1] = -80.0, 80.0  # energy pushes ∅ down, {0} up
    b = np.array([[1.0, 0.0, -9, -9, -9, -9, -9]], np.float32)
    nodes = [
        OnnxNode("Reshape", ["audio", "fshape"], ["fr"]),
        OnnxNode("Abs", ["fr"], ["fa"]),
        OnnxNode("ReduceMean", ["fa"], ["fe"],
                 attrs={"axes": [1], "keepdims": 1}),
        OnnxNode("MatMul", ["fe", "w"], ["fm"]),
        OnnxNode("Add", ["fm", "b"], ["fl"]),
        OnnxNode("LogSoftmax", ["fl"], ["fs"], attrs={"axis": -1}),
        OnnxNode("Reshape", ["fs", "oshape"], ["scores"]),
    ]
    inits = {"fshape": np.array([frames, hop], np.int64),
             "oshape": np.array([1, frames, 7], np.int64),
             "w": w, "b": b}
    graph = OnnxGraph(nodes=nodes, initializers=inits,
                      inputs=[OnnxValueInfo("audio", 1, (1, 1, n))],
                      outputs=[OnnxValueInfo("scores", 1,
                                             (1, frames, 7))])
    aux = tmp_path / "models" / "aux"
    aux.mkdir(parents=True)
    onnx_io.save(OnnxModel(graph), str(aux / "segmentation.onnx"))
    monkeypatch.setenv("OPENHUSH_MODEL_DIR", str(tmp_path / "models"))

    eng = DiarizationEngine.from_local()
    assert eng.has_segmentation and eng.seg_fn is not None

    audio = np.zeros(n, np.float32)
    audio[2 * hop:20 * hop] = 0.4   # loud 0.02-0.2 s
    regions = eng.segment_regions(audio)
    assert regions, "no regions found"
    (s0, s1, ch) = regions[0]
    assert ch == 0
    assert abs(s0 - 2 * hop) <= hop and abs(s1 - 20 * hop) <= hop
