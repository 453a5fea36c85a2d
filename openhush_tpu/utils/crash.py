"""Crash reporting: uncaught exceptions → timestamped report file.

Parity: src/panic_handler.rs (182 LoC) — a hook installed first thing at
startup that writes timestamp/version/backtrace to crash.log so field
failures are diagnosable. Python's sys.excepthook + threading.excepthook
replace Rust's panic hook.
"""

from __future__ import annotations

import datetime
import logging
import os
import sys
import threading
import traceback

log = logging.getLogger(__name__)


def crash_log_path() -> str:
    data = os.environ.get(
        "XDG_DATA_HOME", os.path.join(os.path.expanduser("~"), ".local",
                                      "share"))
    return os.path.join(data, "openhush-tpu", "crash.log")


def write_crash_report(exc_type, exc, tb, origin: str = "main") -> str:
    from openhush_tpu import __version__
    path = crash_log_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write("=" * 60 + "\n")
        f.write(f"timestamp: {datetime.datetime.now().isoformat()}\n")
        f.write(f"version: openhush-tpu {__version__}\n")
        f.write(f"python: {sys.version.split()[0]}\n")
        f.write(f"origin: {origin}\n")
        f.write("".join(traceback.format_exception(exc_type, exc, tb)))
        f.write("\n")
    return path


def install() -> None:
    """Install crash hooks (call first at startup — parity:
    src/main.rs:416 installing the panic handler before anything else)."""
    prev_hook = sys.excepthook

    def hook(exc_type, exc, tb):
        try:
            path = write_crash_report(exc_type, exc, tb)
            print(f"openhush-tpu crashed — report written to {path}",
                  file=sys.stderr)
        except Exception:  # noqa: BLE001 — never mask the original crash
            pass
        prev_hook(exc_type, exc, tb)

    sys.excepthook = hook

    def thread_hook(args):
        try:
            write_crash_report(args.exc_type, args.exc_value,
                               args.exc_traceback,
                               origin=f"thread:{args.thread.name}")
        except Exception:  # noqa: BLE001
            pass
        log.error("Uncaught exception in thread %s", args.thread.name,
                  exc_info=(args.exc_type, args.exc_value,
                            args.exc_traceback))

    threading.excepthook = thread_hook
