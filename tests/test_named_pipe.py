"""Named-pipe IPC framing (parity: src/ipc/named_pipe.rs — the Windows
control plane). The Win32 transport can't run on Linux CI; these tests
pin the shared FRAMING + protocol over the POSIX FIFO transport the
module uses on non-Windows hosts."""

import threading

import pytest

from openhush_tpu.runtime.named_pipe import (NamedPipeClient,
                                             NamedPipeServer, _frame,
                                             _parse_line)


def test_frame_roundtrip():
    assert _parse_line(_frame({"cmd": "status"})) == {"cmd": "status"}
    assert _parse_line(b"not json\n") == {"_malformed": True}
    assert _parse_line(b"") == {}


@pytest.fixture
def pipe(tmp_path):
    calls = []

    def handler(req):
        calls.append(req)
        if req.get("cmd") == "status":
            return {"ok": True, "version": "test"}
        if req.get("cmd") == "boom":
            raise RuntimeError("kaboom")
        return {"ok": False, "error": "unknown"}

    server = NamedPipeServer(handler, path=str(tmp_path / "oh.pipe"))
    server.start()
    yield server, calls
    server.stop()


def test_request_response(pipe):
    server, calls = pipe
    client = NamedPipeClient(path=server.path, timeout=10)
    r = client.send("status")
    assert r == {"ok": True, "version": "test"}
    assert calls == [{"cmd": "status"}]


def test_sequential_requests_same_stream(pipe):
    server, _ = pipe
    client = NamedPipeClient(path=server.path, timeout=10)
    for _ in range(5):
        assert client.send("status")["ok"]


def test_extra_fields_pass_through(pipe):
    server, calls = pipe
    client = NamedPipeClient(path=server.path, timeout=10)
    client.send("status", window=3)
    assert calls[-1] == {"cmd": "status", "window": 3}


def test_handler_exception_becomes_error(pipe):
    server, _ = pipe
    client = NamedPipeClient(path=server.path, timeout=10)
    r = client.send("boom")
    assert r["ok"] is False and "kaboom" in r["error"]


def test_malformed_json_rejected(pipe):
    server, _ = pipe
    import os
    os.close(os.open(server.path + ".req", os.O_WRONLY))  # no-op open
    fd = os.open(server.path + ".req", os.O_WRONLY)
    os.write(fd, b"this is not json\n")
    os.close(fd)
    # The server must answer with an error frame, not die: follow with a
    # valid request on a fresh exchange.
    client = NamedPipeClient(path=server.path, timeout=10)
    # Drain the error response produced for the malformed line first.
    import select
    rsp = os.open(server.path + ".rsp", os.O_RDONLY | os.O_NONBLOCK)
    buf = b""
    for _ in range(40):
        r, _, _ = select.select([rsp], [], [], 0.25)
        if r:
            buf += os.read(rsp, 4096)
        if b"\n" in buf:
            break
    os.close(rsp)
    assert b"invalid JSON" in buf
    assert client.send("status")["ok"]


def test_client_without_server_raises():
    with pytest.raises(ConnectionError):
        NamedPipeClient(path="/nonexistent/never.pipe").send("status")


def test_daemon_wire_protocol_over_pipe(pipe):
    """The pipe speaks the same {"cmd"}/{"ok"} protocol as the Unix
    socket (src/ipc/mod.rs:45-66) — one control-plane contract."""
    server, _ = pipe
    client = NamedPipeClient(path=server.path, timeout=10)
    assert client.send("nope") == {"ok": False, "error": "unknown"}
