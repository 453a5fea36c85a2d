"""Ring buffer, tracker, and VAD tests — mirroring the reference's unit
coverage (ring_buffer.rs:307-400, queue/mod.rs:310-466, vad/mod.rs:248-315)."""

import numpy as np
import pytest

from openhush_tpu.models import vad
from openhush_tpu.runtime.ring_buffer import RingBuffer
from openhush_tpu.runtime.tracker import (ChunkResult, TranscriptionTracker)


# ---------- ring buffer ----------

def test_ring_push_extract():
    rb = RingBuffer(duration_secs=1.0, sample_rate=16000)
    m = rb.mark()
    rb.push(np.arange(100, dtype=np.float32))
    out = rb.extract_since(m)
    np.testing.assert_array_equal(out, np.arange(100, dtype=np.float32))


def test_ring_capacity_power_of_two():
    rb = RingBuffer(duration_secs=1.0, sample_rate=16000)
    assert rb.capacity == 16384
    assert rb.capacity & (rb.capacity - 1) == 0


def test_ring_wraparound():
    rb = RingBuffer(duration_secs=0.01, sample_rate=16000)  # capacity 256
    cap = rb.capacity
    rb.push(np.zeros(cap - 10, np.float32))
    m = rb.mark()
    data = np.arange(50, dtype=np.float32)
    rb.push(data)  # wraps
    out = rb.extract_since(m)
    np.testing.assert_array_equal(out, data)


def test_ring_overflow_returns_newest():
    rb = RingBuffer(duration_secs=0.01, sample_rate=16000)
    cap = rb.capacity
    m = rb.mark()
    big = np.arange(cap * 2, dtype=np.float32)
    rb.push(big)
    out = rb.extract_since(m)
    assert len(out) == cap
    np.testing.assert_array_equal(out, big[-cap:])


def test_ring_extract_range_partial():
    rb = RingBuffer(duration_secs=0.1, sample_rate=16000)
    rb.push(np.arange(500, dtype=np.float32))
    out = rb.extract_range(100, 200)
    np.testing.assert_array_equal(out, np.arange(100, 200, dtype=np.float32))
    assert len(rb.extract_range(200, 200)) == 0
    assert len(rb.extract_range(300, 200)) == 0


# ---------- tracker ----------

def _res(seq, chunk, text, final=False):
    return ChunkResult(text=text, sequence_id=seq, chunk_id=chunk,
                       is_final=final, duration_secs=1.0)


def test_tracker_streaming_order():
    t = TranscriptionTracker()
    t.add_pending(0, 0)
    t.add_pending(0, 1)
    t.add_result(_res(0, 1, "second chunk here"))
    t.add_result(_res(0, 0, "first chunk here"))
    out = t.take_ready()
    assert [r.chunk_id for r in out] == [0, 1]
    assert t.is_empty()


def test_tracker_ordered_mode():
    t = TranscriptionTracker(streaming=False)
    t.add_result(_res(1, 0, "b"))
    assert t.take_ready() == []          # waiting for seq 0
    t.add_result(_res(0, 0, "a"))
    out = t.take_ready()
    assert [r.text for r in out] == ["a", "b"]


def test_tracker_dedup_overlap():
    t = TranscriptionTracker()
    t.add_result(_res(0, 0, "the quick brown fox jumps"))
    t.take_ready()
    t.add_result(_res(0, 1, "fox jumps over the lazy dog"))
    out = t.take_ready()
    assert out[0].text == "over the lazy dog"


def test_tracker_dedup_no_false_positive():
    t = TranscriptionTracker()
    t.add_result(_res(0, 0, "completely different sentence"))
    t.take_ready()
    t.add_result(_res(0, 1, "nothing matches here at all"))
    out = t.take_ready()
    assert out[0].text == "nothing matches here at all"


def test_tracker_dedup_reset():
    t = TranscriptionTracker()
    t.add_result(_res(0, 0, "hello world again today"))
    t.take_ready()
    t.reset_dedup()
    t.add_result(_res(1, 0, "world again is fine"))
    assert t.take_ready()[0].text == "world again is fine"


def test_tracker_backpressure_drop_newest():
    t = TranscriptionTracker()
    for i in range(10):
        assert t.add_pending(0, i, max_pending=10, strategy="drop_newest")
    assert not t.add_pending(0, 10, max_pending=10, strategy="drop_newest")
    assert t.pending_count == 10


def test_tracker_backpressure_drop_oldest():
    t = TranscriptionTracker()
    for i in range(10):
        t.add_pending(0, i, max_pending=10, strategy="drop_oldest")
    assert t.add_pending(0, 10, max_pending=10, strategy="drop_oldest")
    assert t.pending_count == 10
    assert (0, 0) not in t._pending
    assert (0, 10) in t._pending


def test_tracker_backpressure_warn_accepts():
    t = TranscriptionTracker()
    for i in range(15):
        assert t.add_pending(0, i, max_pending=10, strategy="warn")
    assert t.pending_count == 15


# ---------- VAD ----------

def _tone(n, freq=440.0, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq *
                         np.arange(n) / 16000)).astype(np.float32)


def test_energy_vad_detects_speech_over_noise():
    eng = vad.VadEngine(threshold=0.5, kind="energy")
    rng = np.random.default_rng(0)
    noise = (0.002 * rng.standard_normal(512)).astype(np.float32)
    # Establish noise floor.
    for _ in range(20):
        r = eng.process(noise)
    assert not r.is_speech
    # Loud tonal chunk → speech.
    r = eng.process(_tone(512, amp=0.5) + noise)
    assert r.is_speech
    # Back to noise → eventually not speech.
    for _ in range(5):
        r = eng.process(noise)
    assert not r.is_speech


def test_energy_vad_reset():
    eng = vad.VadEngine(kind="energy")
    eng.process(_tone(512))
    eng.reset()
    assert eng.chunk_size == 512
    assert eng.sample_rate == 16000


def test_gru_vad_runs():
    eng = vad.VadEngine(kind="gru")
    r = eng.process(_tone(512))
    assert 0.0 <= r.probability <= 1.0
    eng.reset()


def test_vad_state_machine():
    """Synthetic probability sequence parity test (src/vad/mod.rs:248-315)."""
    cfg = vad.VadStateConfig(threshold=0.5, min_silence_ms=64,
                             min_speech_ms=64)
    st = vad.VadState(cfg)
    chunk = 512  # 32 ms
    seg = None
    # 5 chunks speech (160 ms) then silence until segment emitted.
    for _ in range(5):
        assert st.update(vad.VadResult(0.9, True), chunk) is None
    assert st.in_speech
    for _ in range(10):
        seg = st.update(vad.VadResult(0.1, False), chunk)
        if seg:
            break
    assert seg is not None
    assert seg.start == 0
    assert seg.end >= 5 * chunk       # includes reference's silence-crossing
    assert seg.avg_probability > 0.4


def test_vad_state_too_short_speech_rejected():
    cfg = vad.VadStateConfig(min_silence_ms=32, min_speech_ms=320)
    st = vad.VadState(cfg)
    st.update(vad.VadResult(0.9, True), 512)     # 32 ms of speech only
    seg = st.update(vad.VadResult(0.1, False), 512)
    seg2 = st.update(vad.VadResult(0.1, False), 512)
    assert seg is None and seg2 is None


def test_vad_state_reset():
    st = vad.VadState()
    st.update(vad.VadResult(0.9, True), 512)
    st.reset()
    assert not st.in_speech
    assert st.speech_start is None
