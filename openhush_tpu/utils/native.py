"""ctypes bindings for the native runtime (native/openhush_native.cpp).

Builds on first use if g++ is available (no pybind11 in this image); every
consumer (ring buffer, DSP) falls back to the pure-Python/JAX implementation
when the library is missing, so the framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libopenhush_native.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_attempted = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                           text=True, timeout=120)
        if r.returncode != 0:
            log.warning("native build failed: %s", r.stderr[-500:])
            return False
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("native build unavailable: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if _build_attempted:
                return None
            _build_attempted = True
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            log.warning("native library load failed: %s", e)
            return None
        # Signatures.
        lib.oh_ring_create.restype = ctypes.c_void_p
        lib.oh_ring_create.argtypes = [ctypes.c_uint64]
        lib.oh_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.oh_ring_capacity.restype = ctypes.c_uint64
        lib.oh_ring_capacity.argtypes = [ctypes.c_void_p]
        lib.oh_ring_push.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_uint64]
        lib.oh_ring_position.restype = ctypes.c_uint64
        lib.oh_ring_position.argtypes = [ctypes.c_void_p]
        lib.oh_ring_extract.restype = ctypes.c_uint64
        lib.oh_ring_extract.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                        ctypes.c_uint64,
                                        ctypes.POINTER(ctypes.c_float)]
        lib.oh_dsp_compress.argtypes = [ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_uint64] + [ctypes.c_float] * 6
        lib.oh_dsp_limit.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_uint64] + [ctypes.c_float] * 3
        lib.oh_dsp_rms_db.restype = ctypes.c_float
        lib.oh_dsp_rms_db.argtypes = [ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_uint64]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeRing:
    """Lock-free SPSC ring (producer thread + consumer thread only)."""

    def __init__(self, min_capacity: int):
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.oh_ring_create(min_capacity)
        if not self._handle:
            raise MemoryError("oh_ring_create failed")
        self.capacity = int(lib.oh_ring_capacity(self._handle))

    def push(self, samples: np.ndarray) -> None:
        a = np.ascontiguousarray(samples, np.float32).ravel()
        self._lib.oh_ring_push(self._handle, _fptr(a), len(a))

    def position(self) -> int:
        return int(self._lib.oh_ring_position(self._handle))

    def extract_range(self, from_pos: int, to_pos: int) -> np.ndarray:
        if to_pos <= from_pos:
            return np.zeros(0, np.float32)
        n = min(to_pos - from_pos, self.capacity)
        out = np.empty(n, np.float32)
        got = self._lib.oh_ring_extract(self._handle, from_pos, to_pos,
                                        _fptr(out))
        return out[:got]

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.oh_ring_destroy(self._handle)
            self._handle = None


def compress(x: np.ndarray, threshold_db=-20.0, ratio=4.0, attack_ms=5.0,
             release_ms=50.0, makeup_gain_db=0.0,
             sample_rate=16000) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(x, np.float32).copy()
    lib.oh_dsp_compress(_fptr(a), len(a), threshold_db, ratio, attack_ms,
                        release_ms, makeup_gain_db, float(sample_rate))
    return a


def limit(x: np.ndarray, ceiling_db=-1.0, release_ms=50.0,
          sample_rate=16000) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(x, np.float32).copy()
    lib.oh_dsp_limit(_fptr(a), len(a), ceiling_db, release_ms,
                     float(sample_rate))
    return a


def rms_db(x: np.ndarray) -> Optional[float]:
    lib = load()
    if lib is None:
        return None
    a = np.ascontiguousarray(x, np.float32)
    v = float(lib.oh_dsp_rms_db(_fptr(a), len(a)))
    return float("-inf") if v <= -1e29 else v
