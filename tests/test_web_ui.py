"""Web preferences/wizard UI tests (reference scope: src/gui/mod.rs
preferences window, src/gui/wizard.rs first-run wizard,
src/gui/channel_selector.rs). Drives the HTTP surface a browser would."""

import json
import urllib.request

import pytest

from openhush_tpu.ui.web import PrefsServer


@pytest.fixture
def ui(tmp_path, monkeypatch):
    monkeypatch.setenv("OPENHUSH_CONFIG", str(tmp_path / "config.toml"))
    server = PrefsServer()
    server.start()
    yield server
    server.stop()


def _get(ui, path, token=None, parse=True):
    tok = ui.token if token is None else token
    req = urllib.request.Request(
        f"http://127.0.0.1:{ui.port}{path}?token={tok}")
    with urllib.request.urlopen(req, timeout=10) as r:
        body = r.read()
        return json.loads(body) if parse else body.decode()


def _post(ui, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{ui.port}{path}?token={ui.token}",
        data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_pages_served(ui):
    html = _get(ui, "/", parse=False)
    assert "OpenHush Preferences" in html
    wizard = _get(ui, "/wizard", parse=False)
    assert "Welcome to OpenHush" in wizard
    for step in ("Model", "Hotkey", "Microphone", "Finish"):
        assert step in wizard     # the reference wizard's 4 steps


def test_token_required(ui):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(ui, "/", token="wrong")
    assert e.value.code == 403
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(ui, "/api/config", token="")
    assert e.value.code == 403


def test_config_roundtrip(ui):
    data = _get(ui, "/api/config")
    cfg = data["config"]
    assert "transcription" in cfg and "hotkey" in cfg and "audio" in cfg
    cfg["transcription"]["model"] = "small"
    cfg["hotkey"]["key"] = "f9"
    r = _post(ui, "/api/config", {"config": cfg})
    assert r["ok"], r
    again = _get(ui, "/api/config")["config"]
    assert again["transcription"]["model"] == "small"
    assert again["hotkey"]["key"] == "f9"


def test_config_validation_rejects(ui):
    cfg = _get(ui, "/api/config")["config"]
    cfg["transcription"]["model"] = "definitely-not-a-model"
    r = _post(ui, "/api/config", {"config": cfg})
    assert not r["ok"]
    assert r["errors"]
    # Unchanged on disk.
    assert _get(ui, "/api/config")["config"]["transcription"]["model"] \
        != "definitely-not-a-model"


def test_model_inventory(ui):
    d = _get(ui, "/api/models")
    names = [m["name"] for m in d["models"]]
    for expected in ("tiny", "base", "small", "medium", "large-v3"):
        assert expected in names
    assert d["default"] in names
    assert isinstance(d["tpu"], bool)


def test_devices_and_daemon_status(ui):
    d = _get(ui, "/api/devices")
    assert isinstance(d["devices"], list)   # empty on headless CI
    s = _get(ui, "/api/daemon")
    assert s["running"] is False


def test_hotkey_validation(ui):
    assert _post(ui, "/api/hotkey", {"key": "f12"})["ok"]
    r = _post(ui, "/api/hotkey", {"key": "not a key!!"})
    assert not r["ok"] and r["error"]


def test_header_token_auth(ui):
    """API calls authenticate via the X-OpenHush-Token header (the query
    token is only for the initial page load, so the credential stays out
    of URLs / history)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{ui.port}/api/config",
        headers={"X-OpenHush-Token": ui.token})
    with urllib.request.urlopen(req, timeout=10) as r:
        assert "config" in json.loads(r.read())
    req = urllib.request.Request(
        f"http://127.0.0.1:{ui.port}/api/config",
        headers={"X-OpenHush-Token": "wrong"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403


def test_served_js_uses_header_auth(ui):
    """The pages' fetch helper must send the token as a header, not a
    query param."""
    for page in ("/", "/wizard"):
        html = _get(ui, page, parse=False)
        assert "X-OpenHush-Token" in html
        assert "?token=" not in html.split("<script>", 1)[-1]


# ---- wizard finish logic (server-side, DOM-free; VERDICT r2 #9) -------

def test_wizard_finish_merges_config(ui, tmp_path, monkeypatch):
    """The finish step's merge logic (model pick + hotkey + device) runs
    in PrefsServer.wizard_finish — testable without any browser."""
    r = _post(ui, "/api/wizard/finish", {
        "model": "base", "hotkey": "F10", "device": "USB Mic",
        "autostart": False})
    assert r["ok"], r
    from openhush_tpu.utils.config import Config
    cfg = Config.load_or_default()
    assert cfg.transcription.model == "base"
    assert cfg.transcription.preset == "custom"
    assert cfg.hotkey.key == "F10"
    assert cfg.audio.device == "USB Mic"


def test_wizard_finish_empty_fields_keep_defaults(ui):
    r = _post(ui, "/api/wizard/finish", {"model": "", "hotkey": "",
                                         "device": ""})
    assert r["ok"]
    from openhush_tpu.utils.config import Config
    cfg = Config.load_or_default()
    assert cfg.audio.device == ""         # untouched


def test_wizard_finish_rejects_bad_input(ui):
    r = _post(ui, "/api/wizard/finish", {"model": "not-a-model"})
    assert not r["ok"] and r["errors"]
    r = _post(ui, "/api/wizard/finish", {"hotkey": "NotAKey!!!"})
    assert not r["ok"] and "hotkey" in r["errors"][0]


def test_wizard_js_is_dumb_serializer(ui):
    """Guard: the page script must not re-grow config-merge logic — the
    finish handler only serializes the form to /api/wizard/finish."""
    html = _get(ui, "/wizard", parse=False)
    script = html.split("<script>", 1)[-1]
    assert "/api/wizard/finish" in script
    assert "CFG.transcription" not in script
    assert "CFG.hotkey" not in script


# -- round-4 (VERDICT r3 #9): client logic moved server-side -------------------

def test_render_form_field_kinds():
    from openhush_tpu.ui.web import render_form
    html = render_form({"a": {"flag": True, "count": 3, "rate": 0.5,
                              "names": ["x", "y"], "text": 'he said "hi"'},
                        "skip_me": "not-a-dict"})
    assert "<h2>a</h2>" in html and "skip_me" not in html
    assert 'type=checkbox id="a.flag" data-kind=bool checked' in html
    assert 'type=number step=any id="a.count" data-kind=number' in html
    assert 'id="a.names" data-kind=list value="x, y"' in html
    assert "&quot;hi&quot;" in html          # attribute-escaped


def test_coerce_raw_types_and_errors():
    from openhush_tpu.ui.web import coerce_raw
    cur = {"a": {"flag": False, "count": 3, "rate": 0.5,
                 "names": ["x"], "text": "t"}}
    merged, errs = coerce_raw(cur, {
        "a.flag": True, "a.count": "7", "a.rate": "0.25",
        "a.names": " p ,, q ", "a.text": "new",
        "b.nope": "1", "a.count2": "1"})
    assert merged["a"] == {"flag": True, "count": 7, "rate": 0.25,
                           "names": ["p", "q"], "text": "new"}
    assert len(errs) == 2                     # unknown section + key
    _, errs2 = coerce_raw(cur, {"a.count": "not-a-number"})
    assert errs2 and "a.count" in errs2[0]
    assert cur["a"]["count"] == 3             # input never mutated


def test_coerce_raw_bool_strings():
    """Non-browser clients post string form values: bool('false') is
    True, so the usual spellings must parse, and junk must error."""
    from openhush_tpu.ui.web import coerce_raw
    cur = {"a": {"flag": True, "flag2": False}}
    merged, errs = coerce_raw(cur, {"a.flag": "false", "a.flag2": "on"})
    assert merged["a"] == {"flag": False, "flag2": True} and not errs
    merged, errs = coerce_raw(cur, {"a.flag": "0", "a.flag2": "True"})
    assert merged["a"] == {"flag": False, "flag2": True} and not errs
    _, errs = coerce_raw(cur, {"a.flag": "maybe"})
    assert errs and "a.flag" in errs[0]


def test_config_get_includes_server_rendered_form(ui):
    d = _get(ui, "/api/config")
    assert "form_html" in d and "data-kind=" in d["form_html"]


def test_config_post_raw_path_coerces_server_side(ui):
    d = _get(ui, "/api/config")
    raw = {"transcription.model": "base",
           "vad.threshold": "0.75"}
    r = _post(ui, "/api/config", {"raw": raw})
    assert r["ok"], r
    d2 = _get(ui, "/api/config")
    assert d2["config"]["transcription"]["model"] == "base"
    assert d2["config"]["vad"]["threshold"] == 0.75
    # unchanged sections survive the merge
    assert d2["config"]["audio"] == d["config"]["audio"]
    r = _post(ui, "/api/config", {"raw": {"vad.threshold": "zzz"}})
    assert not r["ok"] and "vad.threshold" in r["errors"][0]


def test_model_and_device_options_presentation(ui, monkeypatch):
    from openhush_tpu.ui.web import PrefsServer
    monkeypatch.setattr(
        PrefsServer, "model_inventory", staticmethod(lambda: {
            "models": [{"name": "base", "converted": True},
                       {"name": "large-v3", "converted": False}],
            "default": "base", "tpu": False}))
    opts = PrefsServer.model_options()
    assert opts["options"] == [
        {"value": "base", "label": "base (converted)", "selected": True},
        {"value": "large-v3", "label": "large-v3", "selected": False}]
    assert "smaller model" in opts["hw_message"]
    monkeypatch.setattr(
        PrefsServer, "device_inventory", staticmethod(lambda: [
            {"index": 0, "name": "Mic", "channels": 2,
             "sample_rate": 48000}]))
    dev = PrefsServer.device_options()
    assert dev["options"][0] == {"value": "", "label": "system default"}
    assert dev["options"][1] == {"value": "Mic",
                                 "label": "Mic (2 ch, 48000 Hz)"}


def test_hotkey_and_mic_reports(ui, monkeypatch):
    from openhush_tpu.ui.web import PrefsServer
    ok = PrefsServer.hotkey_report("ctrl+alt+space")
    assert ok == {"ok": True, "css_class": "ok", "message": "Hotkey OK"}
    bad = PrefsServer.hotkey_report("NotAKey!!!")
    assert not bad["ok"] and bad["css_class"] == "err" and bad["message"]
    monkeypatch.setattr(PrefsServer, "mic_test", staticmethod(
        lambda seconds=1.5: {"ok": True, "peak_rms": 0.02,
                             "mean_rms": 0.01}))
    r = PrefsServer.mic_test_report()
    assert r["css_class"] == "ok" and r["meter_pct"] == 16.0
    assert "0.0200" in r["message"]
    monkeypatch.setattr(PrefsServer, "mic_test", staticmethod(
        lambda seconds=1.5: {"ok": False, "error": "no frames"}))
    r = PrefsServer.mic_test_report()
    assert r["css_class"] == "err" and r["meter_pct"] == 0.0
    assert r["message"] == "no frames"


def test_page_scripts_are_declarative(ui):
    """Guard for the whole #9 move: neither page script may contain the
    branching that now lives server-side — no typeof dispatch, no number
    parsing, no label construction, no recommendation ternary."""
    for page in ("/", "/wizard"):
        script = _get(ui, page, parse=False).split("<script>", 1)[-1]
        assert "typeof" not in script
        assert "Number(" not in script
        assert "toFixed" not in script
        assert "(converted)" not in script
        assert "recommended" not in script
