"""REST API tests: route/payload parity, auth hashing, CORS — port of the
reference's api auth/state tests (src/api/auth.rs:85-117)."""

import json
import urllib.error
import urllib.request

import pytest

from openhush_tpu.api.server import ApiServer, hash_api_key


def _get(port, path, key=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
    if key:
        req.add_header("X-API-Key", key)
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.loads(r.read())


def _post(port, path, key=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 method="POST", data=b"")
    if key:
        req.add_header("X-API-Key", key)
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.loads(r.read())


@pytest.fixture
def open_server():
    calls = []
    srv = ApiServer(port=0, status_fn=lambda: {"recording": True,
                                               "queue_depth": 3,
                                               "model": "large-v3"},
                    command_fn=lambda a: calls.append(a) or True)
    srv.start()
    yield srv, calls
    srv.stop()


@pytest.fixture
def locked_server():
    srv = ApiServer(port=0, api_key_hash=hash_api_key("sekrit"),
                    command_fn=lambda a: True)
    srv.start()
    yield srv
    srv.stop()


def test_hash_api_key():
    # SHA-256 parity (reference hashes the raw key bytes).
    assert hash_api_key("test") == \
        "9f86d081884c7d659a2feaa0c55ad015a3bf4f1b2b0b822cd15d6c15b0f00a08"


def test_health_public(open_server):
    srv, _ = open_server
    status, body = _get(srv.port, "/api/v1/health")
    assert status == 200
    assert body["status"] == "ok"
    assert "version" in body


def test_status_payload(open_server):
    srv, _ = open_server
    status, body = _get(srv.port, "/api/v1/status")
    assert status == 200
    assert set(body) == {"running", "recording", "queue_depth", "model",
                         "version"}
    assert body["recording"] is True
    assert body["queue_depth"] == 3


def test_recording_actions(open_server):
    srv, calls = open_server
    for action, msg in [("start", "Recording started"),
                        ("stop", "Recording stopped"),
                        ("toggle", "Recording toggled")]:
        status, body = _post(srv.port, f"/api/v1/recording/{action}")
        assert status == 200
        assert body == {"ok": True, "message": msg}
    assert calls == ["start", "stop", "toggle"]


def test_auth_required(locked_server):
    srv = locked_server
    # Health stays public.
    assert _get(srv.port, "/api/v1/health")[0] == 200
    # Status requires key.
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv.port, "/api/v1/status")
    assert e.value.code == 401
    assert "Missing X-API-Key" in json.loads(e.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv.port, "/api/v1/status", key="wrong")
    assert e.value.code == 401
    # Correct key works.
    assert _get(srv.port, "/api/v1/status", key="sekrit")[0] == 200
    assert _post(srv.port, "/api/v1/recording/start", key="sekrit")[0] == 200


def test_unknown_route_404(open_server):
    srv, _ = open_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv.port, "/api/v1/nope")
    assert e.value.code == 404


def test_openapi_document(open_server):
    srv, _ = open_server
    status, doc = _get(srv.port, "/api/v1/openapi.json")
    assert status == 200
    assert doc["openapi"].startswith("3.")
    assert "/api/v1/recording/start" in doc["paths"]
    assert doc["components"]["securitySchemes"]["api_key"]["name"] == \
        "X-API-Key"


def test_cors_headers():
    srv = ApiServer(port=0, cors_origins=["http://example.com"])
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/health")
        req.add_header("Origin", "http://example.com")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.headers["Access-Control-Allow-Origin"] == \
                "http://example.com"
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/health")
        req2.add_header("Origin", "http://evil.com")
        with urllib.request.urlopen(req2, timeout=5) as r:
            assert r.headers["Access-Control-Allow-Origin"] is None
    finally:
        srv.stop()


def test_cors_restricted_by_default():
    """Unconfigured cors_origins must emit NO CORS headers at all (parity:
    src/api/routes.rs:103-105 'CORS restricted by default') — otherwise any
    web page can read /status and drive /recording on the loopback daemon."""
    srv = ApiServer(port=0)  # cors_origins empty = default
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/health")
        req.add_header("Origin", "http://anything.example")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.headers["Access-Control-Allow-Origin"] is None
    finally:
        srv.stop()


def test_cors_wildcard_must_be_explicit():
    srv = ApiServer(port=0, cors_origins=["*"])
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/health")
        req.add_header("Origin", "http://some.site")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.headers["Access-Control-Allow-Origin"] == "*"
    finally:
        srv.stop()
