"""Dispatch for daemon-backed CLI subcommands (start/stop/status/...).

Filled in as the daemon/control-plane milestones land; until then each
subcommand reports its status honestly instead of pretending."""

from __future__ import annotations

import sys


def dispatch(command: str, args: list[str]) -> int:
    try:
        from openhush_tpu.runtime import daemon
    except ImportError:
        daemon = None
    if daemon is not None and hasattr(daemon, f"cmd_{command.replace('-', '_')}"):
        return getattr(daemon, f"cmd_{command.replace('-', '_')}")(args)
    print(f"'{command}' is not available yet in this build", file=sys.stderr)
    return 2
