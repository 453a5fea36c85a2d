"""Model download queue with priorities and HTTP Range resume.

Parity: src/download_queue.rs (293 LoC) — a global priority gate so large
optional downloads (M2M-100, wake-word models) never starve the Whisper
model download (High > Medium > Low); and the reference's resumable
downloader (src/engine/whisper.rs:486-597): a `.tmp` staging file, a Range
request from its current size, a 200-vs-206 fallback (server ignored the
Range → restart from scratch), and atomic rename on completion.
"""

from __future__ import annotations

import dataclasses
import enum
import heapq
import logging
import os
import threading
import urllib.error
import urllib.request
from typing import Callable, Optional

log = logging.getLogger(__name__)

CHUNK = 1 << 18


class Priority(enum.IntEnum):
    HIGH = 0      # Whisper models
    MEDIUM = 1    # wake word
    LOW = 2       # M2M-100 & other optional


def download_with_resume(url: str, dest: str,
                         progress: Optional[Callable[[int, int], None]] = None,
                         timeout: float = 60.0) -> str:
    """Download `url` to `dest`, resuming a partial `.tmp` if present."""
    tmp = dest + ".tmp"
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    offset = os.path.getsize(tmp) if os.path.exists(tmp) else 0

    req = urllib.request.Request(url)
    if offset > 0:
        req.add_header("Range", f"bytes={offset}-")
    try:
        resp = urllib.request.urlopen(req, timeout=timeout)
    except urllib.error.HTTPError as e:
        if e.code == 416:  # range beyond EOF: tmp is complete or corrupt
            os.replace(tmp, dest)
            return dest
        raise
    status = resp.getcode()
    if offset > 0 and status == 200:
        # Server ignored the Range header — restart from scratch
        # (parity: 200-vs-206 fallback, whisper.rs download path).
        log.warning("Server ignored Range; restarting %s", url)
        offset = 0
    mode = "ab" if (offset > 0 and status == 206) else "wb"
    total = offset
    length = resp.headers.get("Content-Length")
    expected = offset + int(length) if length else 0
    with open(tmp, mode) as f:
        while True:
            data = resp.read(CHUNK)
            if not data:
                break
            f.write(data)
            total += len(data)
            if progress:
                progress(total, expected)
    if expected > 0 and total < expected:
        # Dropped connection reads as EOF: keep the .tmp for a future Range
        # resume and refuse to publish a truncated artifact (parity:
        # src/engine/whisper.rs:584-590 errors on incomplete downloads).
        raise IOError(
            f"incomplete download of {url}: {total}/{expected} bytes "
            f"(kept {tmp} for resume)")
    os.replace(tmp, dest)
    return dest


@dataclasses.dataclass(order=True)
class _Job:
    priority: int
    seq: int
    url: str = dataclasses.field(compare=False)
    dest: str = dataclasses.field(compare=False)
    done: threading.Event = dataclasses.field(compare=False)
    error: Optional[Exception] = dataclasses.field(compare=False,
                                                   default=None)


class DownloadQueue:
    """One global download worker draining a priority heap — big Low-
    priority downloads queue behind High ones (parity:
    src/download_queue.rs:14-199)."""

    def __init__(self):
        self._heap: list[_Job] = []
        self._cv = threading.Condition()
        self._seq = 0
        self._running = True
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="download-queue")
        self._thread.start()

    def enqueue(self, url: str, dest: str,
                priority: Priority = Priority.MEDIUM) -> _Job:
        job = _Job(int(priority), self._next_seq(), url, dest,
                   threading.Event())
        with self._cv:
            heapq.heappush(self._heap, job)
            self._cv.notify()
        return job

    def download(self, url: str, dest: str,
                 priority: Priority = Priority.MEDIUM,
                 timeout: float = 3600.0) -> str:
        """Enqueue and wait. Raises the worker's exception on failure."""
        job = self.enqueue(url, dest, priority)
        if not job.done.wait(timeout):
            raise TimeoutError(f"download of {url} timed out")
        if job.error is not None:
            raise job.error
        return dest

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    def _worker(self) -> None:
        while True:
            with self._cv:
                while self._running and not self._heap:
                    self._cv.wait(timeout=0.5)
                if not self._running:
                    return
                job = heapq.heappop(self._heap)
            try:
                if not os.path.exists(job.dest):
                    download_with_resume(job.url, job.dest)
            except Exception as e:  # noqa: BLE001
                job.error = e
                log.warning("Download failed %s: %s", job.url, e)
            finally:
                job.done.set()

    def stop(self) -> None:
        with self._cv:
            self._running = False
            self._cv.notify_all()
        self._thread.join(timeout=5)


_queue: Optional[DownloadQueue] = None


def global_queue() -> DownloadQueue:
    global _queue
    if _queue is None:
        _queue = DownloadQueue()
    return _queue
