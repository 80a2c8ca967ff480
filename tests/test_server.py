"""Serving daemon tests: protocol, caching, isolation, lifecycle.

The server is the production analog of the reference's one-shot CLI
consumers (reference: examples/analyze.c, src/analyze.c:33) — a resident
process with warm compiled programs and a warm FeatureStore. Everything
runs headless on CPU over a tmp Unix socket / loopback TCP.
"""

import json
import os
import socket
import threading
import wave

import numpy as np
import pytest

from bliss_tpu.server import AnalysisServer, request
from bliss_tpu.store import FeatureStore


def _write_wav(path, seconds=1.0, freq=440.0, beat_hz=2.0, amp=6000.0):
    n = int(22050 * seconds)
    t = np.arange(n)
    sig = amp * np.sin(2 * np.pi * freq * t / 22050.0)
    sig *= 0.4 + 0.6 * (((t * beat_hz / 22050.0) % 1.0) < 0.4)
    pcm = np.clip(sig, -32767, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(np.stack([pcm, pcm], axis=1).tobytes())
    return str(path)


@pytest.fixture
def served(tmp_path):
    """A running server on a tmp Unix socket with an attached store."""
    sock = str(tmp_path / "bliss.sock")
    store = FeatureStore(str(tmp_path / "store"))
    server = AnalysisServer(sock, store=store, batch_size=8)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert server.wait_ready(30)
    yield server, sock, store, tmp_path
    server.stop()
    t.join(timeout=30)
    assert not t.is_alive()


def test_ping_status_and_id_passthrough(served):
    server, sock, store, _ = served
    assert request({"op": "ping", "id": 7}, sock) == {
        "ok": True, "pong": True, "id": 7,
    }
    st = request({"op": "status"}, sock)
    assert st["ok"] and st["backend"] == "cpu"
    assert st["store"]["entries"] == 0
    assert st["requests"] >= 1


def test_analyze_caches_in_store(served):
    server, sock, store, tmp = served
    a = _write_wav(tmp / "a.wav", freq=300.0)
    b = _write_wav(tmp / "b.wav", freq=1200.0, beat_hz=3.0)
    r1 = request({"op": "analyze", "paths": [a, b]}, sock)
    assert r1["ok"] and r1["errors"] == {}
    assert set(r1["features"]) == {a, b}
    assert all(len(v) == 4 and np.isfinite(v).all()
               for v in r1["features"].values())
    assert len(store) == 2  # cached under (content, config) keys
    # repeat request: served from the warm store, bitwise-identical
    r2 = request({"op": "analyze", "paths": [a, b]}, sock)
    assert r2["features"] == r1["features"]
    assert len(store) == 2


def test_analyze_extended(served):
    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav")
    r = request({"op": "analyze", "paths": [a], "extended": True}, sock)
    assert r["ok"]
    assert len(r["extended"][a]) == len(r["extended_names"])


def test_distance_paths_and_vectors(served):
    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav", freq=300.0)
    r = request({"op": "distance", "a": a, "b": [0.0, 0.0, 0.0, 0.0]}, sock)
    assert r["ok"]
    va = np.asarray(request(
        {"op": "analyze", "paths": [a]}, sock)["features"][a])
    assert r["distance"] == pytest.approx(float(np.linalg.norm(va)), rel=1e-5)
    # self-distance ~ 0, similarity ~ 1 (reference README.md:17 property)
    r = request({"op": "distance", "a": a, "b": a}, sock)
    assert r["distance"] == pytest.approx(0.0, abs=1e-6)
    assert r["similarity"] == pytest.approx(1.0, abs=1e-6)


def test_playlist_orders_by_similarity(served):
    server, sock, _, tmp = served
    seed = _write_wav(tmp / "seed.wav", freq=400.0)
    near = _write_wav(tmp / "near.wav", freq=410.0)
    far = _write_wav(tmp / "far.wav", freq=5000.0, beat_hz=6.0, amp=16000.0)
    r = request(
        {"op": "playlist", "seed": seed, "paths": [far, near]}, sock
    )
    assert r["ok"]
    assert r["paths"][0] == seed and set(r["paths"]) == {seed, near, far}


def test_per_request_isolation(served):
    server, sock, _, tmp = served
    # bad op
    r = request({"op": "frobnicate"}, sock)
    assert not r["ok"] and "unknown op" in r["error"]
    # malformed JSON line
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(30)
        s.connect(sock)
        s.sendall(b"{not json\n")
        assert not json.loads(s.makefile().readline())["ok"]
    # a missing file is an error ROW, not a failed request
    good = _write_wav(tmp / "good.wav")
    r = request(
        {"op": "analyze", "paths": [good, str(tmp / "missing.flac")]}, sock
    )
    assert r["ok"] and good in r["features"]
    assert str(tmp / "missing.flac") in r["errors"]
    # server still alive
    assert request({"op": "ping"}, sock)["ok"]


def test_shutdown_op_stops_server_and_unlinks_socket(tmp_path):
    sock = str(tmp_path / "bliss.sock")
    server = AnalysisServer(sock)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert server.wait_ready(30)
    assert request({"op": "shutdown"}, sock)["stopping"]
    t.join(timeout=30)
    assert not t.is_alive()
    assert not os.path.exists(sock)


def test_tcp_transport(tmp_path):
    server = AnalysisServer(None, port=0)  # ephemeral loopback port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert server.wait_ready(30)
    try:
        a = _write_wav(tmp_path / "a.wav")
        r = request({"op": "analyze", "paths": [a]}, port=server.port)
        assert r["ok"] and a in r["features"]
    finally:
        server.stop()
        t.join(timeout=30)
    assert not t.is_alive()


def test_scan_op_streams_progress_and_fills_store(served):
    server, sock, store, tmp = served
    lib = tmp / "lib"
    lib.mkdir()
    for i in range(3):
        _write_wav(lib / f"s{i}.wav", freq=300.0 + 200 * i)
    events = []
    r = request(
        {"op": "scan", "dir": str(lib), "progress": True}, sock,
        on_event=events.append,
    )
    assert r["ok"] and r["files"] == 3 and r["analyzed"] == 3
    assert r["errors"] == {} and len(store) == 3
    assert events and all(e["event"] == "progress" for e in events)
    assert events[-1]["done"] == 3 and events[-1]["total"] == 3
    # re-scan: all store hits, still correct
    r2 = request({"op": "scan", "dir": str(lib)}, sock)
    assert r2["analyzed"] == 3 and len(store) == 3
    # bad dir is a request error, server survives
    assert not request({"op": "scan", "dir": str(lib / "nope")}, sock)["ok"]
    assert request({"op": "ping"}, sock)["ok"]


def test_neighbors_op_from_warm_store(served):
    server, sock, store, tmp = served
    lib = tmp / "lib"
    lib.mkdir()
    paths = [
        _write_wav(lib / "a.wav", freq=400.0),
        _write_wav(lib / "b.wav", freq=420.0),
        _write_wav(lib / "c.wav", freq=4000.0, beat_hz=5.0, amp=14000.0),
    ]
    assert request({"op": "scan", "dir": str(lib)}, sock)["analyzed"] == 3
    r = request({"op": "neighbors", "top_k": 2}, sock)
    assert r["ok"] and set(r["neighbors"]) == set(paths)
    for nbrs in r["neighbors"].values():
        assert len(nbrs) == 2
        assert nbrs[0]["distance"] <= nbrs[1]["distance"]
    # a/b are near-identical tones -> mutual nearest
    assert r["neighbors"][paths[0]][0]["path"] == paths[1]
    # without a store it's a request error
    bare = AnalysisServer(str(tmp / "bare.sock"))
    t = threading.Thread(target=bare.serve_forever, daemon=True)
    t.start()
    assert bare.wait_ready(30)
    try:
        rr = request({"op": "neighbors"}, str(tmp / "bare.sock"))
        assert not rr["ok"] and "--store" in rr["error"]
    finally:
        bare.stop()
        t.join(timeout=30)


def test_warmup_compiles_without_traffic(tmp_path):
    server = AnalysisServer(str(tmp_path / "s.sock"))
    server.warmup(seconds=1.0)  # must not raise; leaves no files behind
    assert list(tmp_path.iterdir()) == []


def test_cli_serve_requires_exactly_one_transport(tmp_path):
    from bliss_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["serve"])  # neither --socket nor --port
    with pytest.raises(SystemExit):
        main(["serve", "--socket", str(tmp_path / "s"), "--port", "0"])


def test_cli_call_roundtrip(served, capsys):
    from bliss_tpu.cli import main

    server, sock, _, _ = served
    rc = main(["call", "--socket", sock, '{"op": "ping"}'])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out == {"ok": True, "pong": True}
    # error responses exit nonzero
    rc = main(["call", "--socket", sock, '{"op": "nope"}'])
    assert rc == 1
    capsys.readouterr()
    with pytest.raises(SystemExit):
        main(["call", "--socket", sock, "{not json"])
    with pytest.raises(SystemExit):
        main(["call", '{"op": "ping"}'])  # no transport


def test_concurrent_clients(served):
    """Two clients issuing requests at once both get correct replies
    (analysis is serialized internally; the protocol is per-connection)."""
    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav")
    results = {}

    def client(name):
        results[name] = request({"op": "analyze", "paths": [a], "id": name}, sock)

    ts = [threading.Thread(target=client, args=(f"c{i}",)) for i in range(3)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert len(results) == 3
    vals = [tuple(r["features"][a]) for r in results.values()]
    assert all(r["ok"] for r in results.values())
    assert len(set(vals)) == 1


def test_playlist_length_zero_and_negative(served):
    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav", freq=300.0)
    b = _write_wav(tmp / "b.wav", freq=900.0)
    r = request({"op": "playlist", "seed": a, "paths": [b], "length": 0}, sock)
    assert r["ok"] and r["paths"] == []
    r = request({"op": "playlist", "seed": a, "paths": [b], "length": 1}, sock)
    assert r["ok"] and r["paths"] == [a]
    r = request({"op": "playlist", "seed": a, "paths": [b], "length": -1}, sock)
    assert not r["ok"] and "non-negative" in r["error"]


def test_neighbors_rejects_bad_top_k(served):
    server, sock, _, _ = served
    r = request({"op": "neighbors", "top_k": 0}, sock)
    assert not r["ok"] and "top_k must be >= 1" in r["error"]


def test_bind_refuses_live_socket_and_spares_replacement(tmp_path):
    """Starting a second daemon on a live socket must fail instead of
    silently cutting the first one off; and a stopping server must not
    unlink a socket file it no longer owns."""
    sock = str(tmp_path / "bliss.sock")
    a = AnalysisServer(sock)
    t = threading.Thread(target=a.serve_forever, daemon=True)
    t.start()
    assert a.wait_ready(30)

    b = AnalysisServer(sock)
    with pytest.raises(RuntimeError, match="already listening"):
        b.bind()
    # the probe must not have broken A
    assert request({"op": "ping"}, sock)["ok"]

    # simulate a takeover: replace A's socket file with someone else's
    os.unlink(sock)
    other = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    other.bind(sock)
    try:
        a.stop()
        t.join(timeout=30)
        assert not t.is_alive()
        # A must NOT have unlinked the replacement socket
        assert os.path.exists(sock)
    finally:
        other.close()
        os.unlink(sock)


def test_scan_survives_client_that_stops_reading(served):
    """A progress-streaming client that disconnects mid-scan must not wedge
    the daemon (emits run under the analysis lock)."""
    server, sock, store, tmp = served
    lib = tmp / "lib"
    lib.mkdir()
    for i in range(3):
        _write_wav(lib / f"s{i}.wav", freq=300.0 + 100 * i)
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(sock)
    s.sendall(json.dumps(
        {"op": "scan", "dir": str(lib), "progress": True}
    ).encode() + b"\n")
    s.close()  # walk away before any progress/response line
    # the daemon must finish the scan and stay responsive
    deadline = 120
    import time
    t0 = time.time()
    while len(store) < 3 and time.time() - t0 < deadline:
        time.sleep(0.5)
    assert len(store) == 3
    assert request({"op": "ping"}, sock)["ok"]


def test_ephemeral_port_resolves_before_serving(tmp_path):
    """bind() must resolve port=0 to the real port so `serve` can announce
    a usable address (cli prints it before serve_forever)."""
    server = AnalysisServer(port=0)
    server.bind()
    assert server.port != 0
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert server.wait_ready(30)
    try:
        assert request({"op": "ping"}, port=server.port)["ok"]
    finally:
        server.stop()
        t.join(timeout=30)
        assert not t.is_alive()


def test_protocol_fuzz_malformed_requests(served):
    """The daemon must answer (or cleanly drop) anything a confused client
    throws at it, and stay alive throughout."""
    server, sock, _, _ = served
    evil = [
        b"not json at all\n",
        b"[1, 2, 3]\n",                      # JSON but not an object
        b'"just a string"\n',
        b"{}\n",                              # no op
        b'{"op": "no_such_op"}\n',
        b'{"op": null}\n',
        b'{"op": "analyze"}\n',               # missing paths
        b'{"op": "analyze", "paths": []}\n',
        b'{"op": "analyze", "paths": [42]}\n',
        b'{"op": "scan", "dir": "/nonexistent/dir"}\n',
        b'{"op": "distance", "a": [1,2], "b": [1,2,3,4]}\n',
        b'{"op": "playlist"}\n',
        b'\xff\xfe garbage bytes\n',
        b'{"op": "ping", "id": {"nested": ["weird", null]}}\n',
    ]
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.connect(sock)
    s.settimeout(60)
    with s:
        buf = b""
        for line in evil:
            s.sendall(line)
            while b"\n" not in buf:
                buf += s.recv(1 << 16)
            resp_line, buf = buf.split(b"\n", 1)
            resp = json.loads(resp_line)
            if b'"ping"' in line:
                assert resp["ok"]
            else:
                assert not resp["ok"] and resp["error"]
    # a single oversized line is rejected and the connection dropped,
    # but the server survives
    s2 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s2.connect(sock)
    s2.settimeout(120)
    with s2:
        big = b'{"op": "ping", "pad": "' + b"x" * (33 << 20) + b'"}\n'
        try:
            s2.sendall(big)
            resp = json.loads(s2.recv(1 << 16).split(b"\n")[0])
            assert not resp["ok"] and "too large" in resp["error"]
        except (BrokenPipeError, ConnectionResetError):
            pass  # server may drop mid-send; that's a clean rejection too
    assert request({"op": "ping"}, sock)["ok"]


def test_concurrent_mixed_clients(served):
    """Many clients issuing mixed ops at once: every request gets a
    correct, request-matched answer (the lock serializes device work but
    must not cross wires between connections)."""
    server, sock, store, tmp = served
    a = _write_wav(tmp / "a.wav", freq=350.0)
    b = _write_wav(tmp / "b.wav", freq=3000.0, beat_hz=5.0)
    # prime the store so neighbors has rows and analyze hits the cache
    assert request({"op": "analyze", "paths": [a, b]}, sock)["ok"]

    results, errors = {}, []

    def client(i):
        try:
            ops = [
                {"op": "ping", "id": i},
                {"op": "status"},
                {"op": "analyze", "paths": [a, b]},
                {"op": "distance", "a": a, "b": b},
                {"op": "neighbors", "top_k": 1},
                {"op": "playlist", "seed": a, "paths": [b]},
            ]
            r = request(ops[i % len(ops)], sock, timeout=300)
            results[i] = r
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(18)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()
    assert not errors
    assert len(results) == 18
    for i, r in results.items():
        assert r["ok"], (i, r)
        kind = i % 6
        if kind == 0:
            assert r["pong"] and r["id"] == i
        elif kind == 2:
            assert set(r["features"]) == {a, b}
        elif kind == 3:
            assert r["distance"] > 0
        elif kind == 4:
            assert r["neighbors"][a][0]["path"] == b
        elif kind == 5:
            assert r["paths"][0] == a


def test_daemon_with_mesh_matches_unsharded(served, tmp_path):
    """A daemon built with a device mesh serves the same features as the
    plain one (the serve --mesh path)."""
    from bliss_tpu.parallel import analysis_mesh

    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav", freq=500.0)
    plain = request({"op": "analyze", "paths": [a]}, sock)
    assert plain["ok"]

    msock = str(tmp_path / "mesh.sock")
    meshed = AnalysisServer(
        msock, store=None, batch_size=8, mesh=analysis_mesh(4, 2)
    )
    t = threading.Thread(target=meshed.serve_forever, daemon=True)
    t.start()
    assert meshed.wait_ready(30)
    try:
        r = request({"op": "analyze", "paths": [a]}, msock, timeout=300)
        assert r["ok"] and r["errors"] == {}
        np.testing.assert_allclose(
            r["features"][a], plain["features"][a], atol=2e-5
        )
    finally:
        meshed.stop()
        t.join(timeout=60)
        assert not t.is_alive()


# --- HTTP gateway -----------------------------------------------------------


@pytest.fixture
def http_served(tmp_path):
    """AnalysisServer with an HTTP gateway on an ephemeral port (HTTP-only:
    no line-protocol listener)."""
    from bliss_tpu.http_gateway import HttpGateway

    store = FeatureStore(str(tmp_path / "store"))
    server = AnalysisServer(port=None, socket_path=None, store=store,
                            batch_size=8)
    gw = HttpGateway(server, port=0)
    gw.start()
    yield server, gw, store, tmp_path
    gw.stop()


def _http(method, port, path, body=None, timeout=300):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=None if body is None else json.dumps(body).encode(),
        method=method,
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read(), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def test_http_ping_status_metrics(http_served):
    server, gw, store, tmp = http_served
    code, body, _ = _http("GET", gw.port, "/ping")
    assert code == 200 and json.loads(body) == {"ok": True, "pong": True}

    code, body, _ = _http("GET", gw.port, "/status")
    st = json.loads(body)
    assert code == 200 and st["ok"] and st["backend"] == "cpu"

    code, body, hdrs = _http("GET", gw.port, "/metrics")
    assert code == 200 and hdrs["Content-Type"].startswith("text/plain")
    text = body.decode()
    assert "bliss_requests_total" in text
    assert "bliss_store_entries 0" in text

    code, body, _ = _http("GET", gw.port, "/nope")
    assert code == 404


def test_http_analyze_and_errors(http_served):
    server, gw, store, tmp = http_served
    a = _write_wav(tmp / "a.wav", freq=600.0)
    code, body, _ = _http("POST", gw.port, "/",
                          {"op": "analyze", "paths": [a]})
    r = json.loads(body)
    assert code == 200 and r["ok"] and len(r["features"][a]) == 4
    assert len(store) == 1

    # request-level errors map to HTTP 400 with the error payload
    code, body, _ = _http("POST", gw.port, "/", {"op": "no_such"})
    r = json.loads(body)
    assert code == 400 and not r["ok"] and "unknown op" in r["error"]

    code, body, _ = _http("POST", gw.port, "/",
                          {"op": "analyze", "paths": []})
    assert code == 400

    # counters moved
    code, body, _ = _http("GET", gw.port, "/metrics")
    text = body.decode()
    assert "bliss_songs_analyzed_total 1" in text
    assert "bliss_store_entries 1" in text


def test_http_shutdown_stops_gateway(tmp_path):
    from bliss_tpu.http_gateway import HttpGateway

    server = AnalysisServer(port=None, socket_path=None)
    gw = HttpGateway(server, port=0)
    gw.start()
    code, body, _ = _http("POST", gw.port, "/", {"op": "shutdown"})
    assert code == 200 and json.loads(body)["stopping"]
    assert server.wait_stopped(30)
    gw.stop()  # idempotent


def test_http_alongside_socket_transport(tmp_path):
    """Both transports on ONE server share the store, counters and lock."""
    from bliss_tpu.http_gateway import HttpGateway

    sock = str(tmp_path / "s.sock")
    store = FeatureStore(str(tmp_path / "store"))
    server = AnalysisServer(sock, store=store, batch_size=8)
    gw = HttpGateway(server, port=0)
    gw.start()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert server.wait_ready(30)
    try:
        a = _write_wav(tmp_path / "a.wav", freq=700.0)
        assert request({"op": "analyze", "paths": [a]}, sock)["ok"]
        code, body, _ = _http("POST", gw.port, "/",
                              {"op": "analyze", "paths": [a]})
        r = json.loads(body)
        assert code == 200 and r["ok"]
        # served from the same warm store (no second entry)
        assert len(store) == 1
        code, body, _ = _http("GET", gw.port, "/metrics")
        assert "bliss_requests_total 2" in body.decode()
    finally:
        gw.stop()
        server.stop()
        t.join(timeout=30)
        assert not t.is_alive()


def test_http_scan_streams_progress(http_served):
    """POST / with progress:true streams chunked NDJSON: interleaved
    progress events, then the final response (always HTTP 200)."""
    import urllib.request

    server, gw, store, tmp = http_served
    lib = tmp / "lib"
    lib.mkdir()
    for i in range(3):
        _write_wav(lib / f"s{i}.wav", freq=300.0 + 90 * i)

    req = urllib.request.Request(
        f"http://127.0.0.1:{gw.port}/",
        data=json.dumps(
            {"op": "scan", "dir": str(lib), "progress": True, "id": 5}
        ).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-ndjson"
        assert r.headers.get("Content-Length") is None  # chunked
        lines = [json.loads(l) for l in r.read().splitlines() if l.strip()]

    final = lines[-1]
    events = lines[:-1]
    assert final["ok"] and final["analyzed"] == 3 and final["id"] == 5
    assert len(events) >= 1  # progress is per finalized batch
    assert all(e["event"] == "progress" and e["id"] == 5 for e in events)
    assert events[-1]["done"] == events[-1]["total"] == 3
    assert len(store) == 3


def test_http_streamed_error_is_last_line(http_served):
    """A failing streamed request still returns HTTP 200 (status already
    sent); the error rides the final NDJSON line."""
    server, gw, store, tmp = http_served
    code, body, hdrs = _http(
        "POST", gw.port, "/",
        {"op": "scan", "dir": str(tmp / "missing"), "progress": True},
    )
    assert code == 200
    assert hdrs["Content-Type"] == "application/x-ndjson"
    lines = [json.loads(l) for l in body.splitlines() if l.strip()]
    assert len(lines) == 1 and not lines[0]["ok"]
    assert "scan needs a 'dir'" in lines[0]["error"]


def test_http_gateway_stop_without_start():
    """stop() on a constructed-but-never-started gateway must not hang on
    the serve_forever shutdown handshake."""
    from bliss_tpu.http_gateway import HttpGateway

    server = AnalysisServer(port=None, socket_path=None)
    gw = HttpGateway(server, port=0)
    gw.stop()  # must return promptly
    assert server.wait_stopped(5)


def test_http_stream_client_disconnect_mid_scan(http_served):
    """A client that drops the connection mid-stream must not wedge or
    kill the daemon: the scan finishes, later events are dropped, and the
    gateway keeps serving."""
    import urllib.request

    server, gw, store, tmp = http_served
    lib = tmp / "lib2"
    lib.mkdir()
    for i in range(5):
        _write_wav(lib / f"s{i}.wav", freq=320.0 + 70 * i)

    body = json.dumps(
        {"op": "scan", "dir": str(lib), "progress": True}
    ).encode()
    s = socket.create_connection(("127.0.0.1", gw.port), timeout=30)
    s.sendall(
        b"POST / HTTP/1.1\r\nHost: x\r\nContent-Length: "
        + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    s.recv(1)  # wait for the status line to start, then vanish
    s.close()

    # the daemon must finish the scan (store fills) and stay responsive
    deadline = 60
    import time as _t
    t0 = _t.time()
    while len(store) < 5 and _t.time() - t0 < deadline:
        _t.sleep(0.5)
    assert len(store) == 5
    code, body2, _ = _http("GET", gw.port, "/ping")
    assert code == 200 and json.loads(body2)["pong"]


# --- backend loss / degraded mode --------------------------------------------


def _boom_backend(*a, **k):
    """Stand-in for a device dispatch that hits a dropped tunnel (the axon
    UNAVAILABLE failure class seen in BENCH_r03)."""
    raise RuntimeError(
        "UNAVAILABLE: Unable to initialize backend 'axon': Socket closed"
    )


def test_backend_loss_degrades_and_recovers(served, monkeypatch):
    """A mid-request device loss fails THAT request cleanly, flips the
    daemon to degraded in /status, and the next device-touching request
    recovers it — the daemon never dies (reference has no resident analog;
    its consumers re-exec per song, examples/analyze.c)."""
    import bliss_tpu.pipeline as pipeline

    server, sock, store, tmp = served
    a = _write_wav(tmp / "a.wav", freq=440.0)
    real = pipeline.analyze_library

    # healthy to start
    st = request({"op": "status"}, sock)
    assert st["backend_health"]["healthy"]
    assert st["backend_health"]["recoveries"] == 0

    # two failing requests: both fail cleanly, daemon stays up, degraded
    monkeypatch.setattr(pipeline, "analyze_library", _boom_backend)
    for _ in range(2):
        r = request({"op": "analyze", "paths": [a]}, sock)
        assert not r["ok"] and "UNAVAILABLE" in r["error"]
    st = request({"op": "status"}, sock)
    assert not st["backend_health"]["healthy"]
    assert st["backend_health"]["consecutive_failures"] == 2
    assert "UNAVAILABLE" in st["backend_health"]["last_error"]
    assert st["backend_health"]["last_failure_unix"] is not None

    # tunnel comes back: next device request succeeds and marks recovery
    monkeypatch.setattr(pipeline, "analyze_library", real)
    r = request({"op": "analyze", "paths": [a]}, sock)
    assert r["ok"] and a in r["features"]
    st = request({"op": "status"}, sock)
    assert st["backend_health"]["healthy"]
    assert st["backend_health"]["consecutive_failures"] == 0
    assert st["backend_health"]["recoveries"] == 1


def test_non_backend_errors_do_not_degrade(served, monkeypatch):
    """Ordinary request failures (bad input, decode errors) must not be
    misclassified as backend loss."""
    import bliss_tpu.pipeline as pipeline

    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav")

    def bad_request(*args, **kwargs):
        raise ValueError("malformed frames")

    monkeypatch.setattr(pipeline, "analyze_library", bad_request)
    r = request({"op": "analyze", "paths": [a]}, sock)
    assert not r["ok"]
    st = request({"op": "status"}, sock)
    assert st["backend_health"]["healthy"]
    assert st["backend_health"]["consecutive_failures"] == 0


def test_backend_health_in_http_metrics(http_served, monkeypatch):
    """/metrics exposes the degraded gauge so operators can alert on it."""
    import bliss_tpu.pipeline as pipeline

    server, gw, store, tmp = http_served
    a = _write_wav(tmp / "a.wav", freq=520.0)
    real = pipeline.analyze_library

    code, body, _ = _http("GET", gw.port, "/metrics")
    assert "bliss_backend_healthy 1" in body.decode()

    monkeypatch.setattr(pipeline, "analyze_library", _boom_backend)
    code, body, _ = _http("POST", gw.port, "/",
                          {"op": "analyze", "paths": [a]})
    assert code == 400 and "UNAVAILABLE" in json.loads(body)["error"]
    code, body, _ = _http("GET", gw.port, "/metrics")
    text = body.decode()
    assert "bliss_backend_healthy 0" in text
    assert "bliss_backend_failures_consecutive 1" in text

    monkeypatch.setattr(pipeline, "analyze_library", real)
    code, body, _ = _http("POST", gw.port, "/",
                          {"op": "analyze", "paths": [a]})
    assert code == 200
    code, body, _ = _http("GET", gw.port, "/metrics")
    text = body.decode()
    assert "bliss_backend_healthy 1" in text
    assert "bliss_backend_recoveries_total 1" in text


def test_health_probe_detects_loss_and_recovers_without_traffic(tmp_path):
    """With --health-probe, a silent backend loss flips the daemon to
    degraded within ~one interval, and recovery happens with NO client
    requests at all — the watchdog's own dispatches do both."""
    import time

    sock = str(tmp_path / "probe.sock")
    server = AnalysisServer(sock, health_probe_interval=0.1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    assert server.wait_ready(30)
    try:
        # break the probe: the watchdog must mark degraded on its own
        server._probe_op = _boom_backend
        deadline = time.time() + 30
        while time.time() < deadline:
            with server._health_lock:
                if not server._backend_health["healthy"]:
                    break
            time.sleep(0.05)
        st = request({"op": "status"}, sock)
        assert not st["backend_health"]["healthy"]
        assert st["backend_health"]["consecutive_failures"] >= 1

        # heal the probe: the watchdog must recover, still with no traffic
        del server._probe_op  # restore the class method
        deadline = time.time() + 30
        while time.time() < deadline:
            with server._health_lock:
                if server._backend_health["healthy"]:
                    break
            time.sleep(0.05)
        st = request({"op": "status"}, sock)
        assert st["backend_health"]["healthy"]
        assert st["backend_health"]["recoveries"] == 1
    finally:
        server.stop()
        t.join(timeout=30)
        assert not t.is_alive()


def test_cli_serve_health_probe_flag(tmp_path):
    from bliss_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["serve", "--socket", str(tmp_path / "s"), "--health-probe", "45"]
    )
    assert args.health_probe == 45.0
    args = build_parser().parse_args(["serve", "--socket", "s"])
    assert args.health_probe == 0.0


def test_is_backend_error_taxonomy():
    from bliss_tpu.server import _is_backend_error

    assert _is_backend_error(RuntimeError("UNAVAILABLE: Socket closed"))
    assert _is_backend_error(
        RuntimeError("Unable to initialize backend 'axon'"))
    assert _is_backend_error(Exception("DEADLINE_EXCEEDED while dispatching"))
    assert not _is_backend_error(ValueError("paths must be strings"))
    assert not _is_backend_error(RuntimeError("decode failed: bad header"))


def test_init_class_failure_triggers_registry_reset(served, monkeypatch):
    """After an init-class backend failure ('Unable to initialize backend'),
    the next device call must attempt the registry reset pre-flight before
    retrying (dispatch-class failures skip it)."""
    import bliss_tpu.pipeline as pipeline
    from bliss_tpu.server import AnalysisServer

    server, sock, _, tmp = served
    a = _write_wav(tmp / "a.wav")
    calls = []
    monkeypatch.setattr(
        AnalysisServer, "_try_backend_recovery",
        staticmethod(lambda last_error: calls.append(last_error)),
    )

    # dispatch-class loss -> recovery pre-flight runs with that message
    def dispatch_boom(*args, **kwargs):
        raise RuntimeError("UNAVAILABLE: Socket closed mid-dispatch")

    real = pipeline.analyze_library
    monkeypatch.setattr(pipeline, "analyze_library", dispatch_boom)
    assert not request({"op": "analyze", "paths": [a]}, sock)["ok"]
    monkeypatch.setattr(pipeline, "analyze_library", real)
    assert request({"op": "analyze", "paths": [a]}, sock)["ok"]
    assert len(calls) == 1 and "Socket closed" in calls[0]
