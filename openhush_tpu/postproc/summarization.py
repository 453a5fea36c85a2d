"""Transcript summarization with pluggable LLM providers.

Parity: src/summarization/ (1,285 LoC) — a provider interface
(provider.rs:92 LlmProvider) with Ollama (ollama.rs) and OpenAI-compatible
(openai.rs, Bearer-token `/v1/chat/completions`) implementations; a template
registry standup/meeting/retro/1on1/summary plus custom templates loaded
from TOML (template.rs:11-16,116); `{transcript}/{date}/{duration}`
placeholder substitution.
"""

from __future__ import annotations

import dataclasses
import datetime
import logging
import os
import tomllib
from typing import Optional, Protocol

from openhush_tpu.utils.http import HttpError, request_json

log = logging.getLogger(__name__)

BUILTIN_TEMPLATES = {
    "summary": (
        "Summarize the following transcript concisely. Capture the key "
        "points and any decisions or conclusions.\n\nDate: {date}\n"
        "Duration: {duration}\n\nTranscript:\n{transcript}\n\nSummary:"),
    "meeting": (
        "Write meeting notes for the following transcript. Include: "
        "attendee topics discussed, decisions made, and action items with "
        "owners where mentioned.\n\nDate: {date}\nDuration: {duration}\n\n"
        "Transcript:\n{transcript}\n\nMeeting notes:"),
    "standup": (
        "Extract a standup update from the following transcript. Format "
        "as: Yesterday / Today / Blockers.\n\nDate: {date}\n\n"
        "Transcript:\n{transcript}\n\nStandup update:"),
    "retro": (
        "Summarize this retrospective discussion. Group into: What went "
        "well / What didn't / Action items.\n\nDate: {date}\n\n"
        "Transcript:\n{transcript}\n\nRetro summary:"),
    "1on1": (
        "Summarize this 1:1 conversation. Include topics raised, feedback "
        "exchanged, and follow-ups.\n\nDate: {date}\n\n"
        "Transcript:\n{transcript}\n\nNotes:"),
}


def render_template(template: str, transcript: str,
                    duration_secs: float = 0.0,
                    when: Optional[datetime.datetime] = None) -> str:
    """{transcript}/{date}/{duration} substitution (template.rs)."""
    when = when or datetime.datetime.now()
    return (template
            .replace("{transcript}", transcript)
            .replace("{date}", when.strftime("%Y-%m-%d"))
            .replace("{duration}", f"{duration_secs:.0f}s"))


class TemplateRegistry:
    """Built-ins + custom templates from a TOML file
    ([templates] name = \"prompt...\")."""

    def __init__(self, custom_path: Optional[str] = None):
        self.templates = dict(BUILTIN_TEMPLATES)
        if custom_path and os.path.exists(custom_path):
            try:
                with open(custom_path, "rb") as f:
                    raw = tomllib.load(f)
                for name, tpl in raw.get("templates", raw).items():
                    if isinstance(tpl, str):
                        self.templates[name] = tpl
            except (OSError, tomllib.TOMLDecodeError) as e:
                log.warning("Failed to load templates %s: %s",
                            custom_path, e)

    def get(self, name: str) -> str:
        try:
            return self.templates[name]
        except KeyError:
            raise ValueError(
                f"unknown template {name!r}; available: "
                f"{sorted(self.templates)}") from None

    def names(self) -> list[str]:
        return sorted(self.templates)


class LlmProvider(Protocol):
    """Parity: provider trait (src/summarization/provider.rs:92)."""

    def generate(self, prompt: str) -> str: ...
    def is_available(self) -> bool: ...


@dataclasses.dataclass
class OllamaProvider:
    url: str = "http://localhost:11434"
    model: str = "llama3.2:1b"
    timeout_secs: float = 120.0

    def generate(self, prompt: str) -> str:
        resp = request_json(f"{self.url}/api/generate", method="POST",
                            payload={"model": self.model, "prompt": prompt,
                                     "stream": False},
                            timeout=self.timeout_secs)
        return str(resp.get("response", "")).strip()

    def is_available(self) -> bool:
        try:
            request_json(f"{self.url}/api/tags", timeout=3)
            return True
        except HttpError:
            return False


@dataclasses.dataclass
class OpenAiCompatProvider:
    """OpenAI-compatible chat API (src/summarization/openai.rs)."""
    url: str = "https://api.openai.com"
    model: str = "gpt-4o-mini"
    api_key: str = ""
    timeout_secs: float = 120.0

    def _endpoint(self) -> str:
        # Accept both base forms: the reference's base_url includes /v1
        # (config.example.toml:110); the bare host form doesn't.
        base = self.url.rstrip("/")
        if not base.endswith("/v1"):
            base += "/v1"
        return f"{base}/chat/completions"

    def generate(self, prompt: str) -> str:
        resp = request_json(
            self._endpoint(), method="POST",
            payload={"model": self.model,
                     "messages": [{"role": "user", "content": prompt}]},
            headers={"Authorization": f"Bearer {self.api_key}"},
            timeout=self.timeout_secs)
        choices = resp.get("choices", [])
        if not choices:
            return ""
        return str(choices[0].get("message", {}).get("content", "")).strip()

    def is_available(self) -> bool:
        return bool(self.api_key)


class Summarizer:
    """Parity: Summarizer::summarize (src/summarization/mod.rs:114)."""

    def __init__(self, provider: LlmProvider,
                 registry: Optional[TemplateRegistry] = None):
        self.provider = provider
        self.registry = registry or TemplateRegistry()

    def summarize(self, transcript: str, template: str = "summary",
                  duration_secs: float = 0.0) -> str:
        prompt = render_template(self.registry.get(template), transcript,
                                 duration_secs)
        return self.provider.generate(prompt)
