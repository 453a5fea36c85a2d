"""Native C++ runtime: parity vs the Python/JAX implementations + an SPSC
concurrency smoke test (the fuzz analogue of the reference's ring_buffer
fuzz target)."""

import threading

import numpy as np
import pytest

from openhush_tpu.utils import native

lib = native.load()
needs_native = pytest.mark.skipif(lib is None,
                                  reason="native toolchain unavailable")


@needs_native
def test_native_ring_basic():
    r = native.NativeRing(1000)
    assert r.capacity == 1024
    r.push(np.arange(100, dtype=np.float32))
    assert r.position() == 100
    out = r.extract_range(0, 100)
    np.testing.assert_array_equal(out, np.arange(100, dtype=np.float32))


@needs_native
def test_native_ring_wraparound_and_overflow():
    r = native.NativeRing(256)
    cap = r.capacity
    r.push(np.zeros(cap - 10, np.float32))
    m = r.position()
    data = np.arange(50, dtype=np.float32)
    r.push(data)
    np.testing.assert_array_equal(r.extract_range(m, r.position()), data)
    big = np.arange(cap * 2, dtype=np.float32)
    start = r.position()
    r.push(big)
    out = r.extract_range(start, r.position())
    np.testing.assert_array_equal(out, big[-cap:])


@needs_native
def test_ring_buffer_uses_native_backend():
    from openhush_tpu.runtime.ring_buffer import RingBuffer
    rb = RingBuffer(duration_secs=1.0)
    assert rb.is_native
    m = rb.mark()
    rb.push(np.arange(500, dtype=np.float32))
    np.testing.assert_array_equal(rb.extract_since(m),
                                  np.arange(500, dtype=np.float32))


@needs_native
def test_native_python_ring_parity():
    """Same random op sequence → identical contents in both backends."""
    from openhush_tpu.runtime.ring_buffer import RingBuffer
    rng = np.random.default_rng(0)
    nat = RingBuffer(duration_secs=0.02)           # tiny: forces wraps
    py = RingBuffer(duration_secs=0.02, prefer_native=False)
    assert nat.capacity == py.capacity
    marks = [(0, 0)]
    for _ in range(200):
        n = int(rng.integers(1, 200))
        data = rng.standard_normal(n).astype(np.float32)
        nat.push(data)
        py.push(data)
        if rng.random() < 0.3:
            marks.append((nat.current_position(), py.current_position()))
        a, b = marks[int(rng.integers(0, len(marks)))]
        assert a == b
        np.testing.assert_array_equal(
            nat.extract_range(a, nat.current_position()),
            py.extract_range(b, py.current_position()))


@needs_native
def test_native_spsc_concurrent():
    """Producer and consumer on different threads: extracted spans must
    always be a contiguous slice of what was pushed. (Ring sized >= total:
    like the reference, an extraction lagging more than a full capacity
    behind the writer reads overwritten data by design.)"""
    r = native.NativeRing(1 << 18)
    total = np.arange(200_000, dtype=np.float32)
    errors = []

    def producer():
        i = 0
        while i < len(total):
            n = min(1000, len(total) - i)
            r.push(total[i:i + n])
            i += n

    def consumer():
        last = 0
        while last < len(total):
            pos = r.position()
            if pos > last:
                out = r.extract_range(last, pos)
                expect = total[last:pos]
                if not np.array_equal(out, expect):
                    errors.append((last, pos))
                    return
                last = pos

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tc.start()
    tp.start()
    tp.join(timeout=30)
    tc.join(timeout=30)
    assert not errors


@needs_native
def test_native_dsp_matches_jax():
    from openhush_tpu.ops import dsp
    rng = np.random.default_rng(1)
    x = (0.8 * rng.standard_normal(16000)).astype(np.float32)
    nat = native.compress(x, threshold_db=-20.0, ratio=4.0)
    ref = np.asarray(dsp.compress(x, threshold_db=-20.0, ratio=4.0))
    np.testing.assert_allclose(nat, ref, atol=2e-5)
    nat_l = native.limit(x, ceiling_db=-6.0)
    ref_l = np.asarray(dsp.limit(x, ceiling_db=-6.0))
    np.testing.assert_allclose(nat_l, ref_l, atol=2e-5)
    assert abs(native.rms_db(x) - float(dsp.rms_db(x))) < 1e-3
    assert native.rms_db(np.zeros(10, np.float32)) == float("-inf")
