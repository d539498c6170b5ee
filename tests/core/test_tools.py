"""Snapshot / Juggler utilities (reference tools suite)."""

import threading

import numpy as np

from cyberether_tpu.utils.tools import Juggler, Snapshot


def test_snapshot_publish_get():
    s = Snapshot(0)
    assert s.get() == 0
    s.publish(42)
    assert s.get() == 42
    assert s.version == 1


def test_snapshot_cross_thread():
    s = Snapshot()
    done = threading.Event()

    def writer():
        for i in range(1000):
            s.publish(i)
        done.set()

    t = threading.Thread(target=writer)
    t.start()
    last = -1
    while not done.is_set():
        v = s.get()
        if v is not None:
            assert v >= last
            last = v
    t.join()
    assert s.get() == 999


def test_juggler_recycles():
    made = []

    def factory():
        buf = np.zeros(16)
        made.append(buf)
        return buf

    j = Juggler(factory, capacity=2)
    a = j.acquire()
    b = j.acquire()
    assert len(made) == 2
    assert j.acquire(timeout=0.01) is None   # pool exhausted
    j.release(a)
    c = j.acquire()
    assert c is a                            # recycled, not rebuilt
    assert len(made) == 2


def test_juggler_blocking_handoff():
    j = Juggler(lambda: object(), capacity=1)
    a = j.acquire()
    got = {}

    def consumer():
        got["obj"] = j.acquire(timeout=5.0)

    t = threading.Thread(target=consumer)
    t.start()
    j.release(a)
    t.join(timeout=5.0)
    assert got["obj"] is a


def test_file_lock(tmp_path):
    from cyberether_tpu.utils.platform import file_lock

    path = str(tmp_path / "x.lock")
    with file_lock(path) as got:
        assert got
        with file_lock(path, blocking=False) as got2:
            assert not got2
    with file_lock(path, blocking=False) as got3:
        assert got3


def test_platform_dirs(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    from cyberether_tpu.utils.platform import cache_dir, data_dir

    assert data_dir().startswith(str(tmp_path))
    assert cache_dir().startswith(str(tmp_path))


def test_fetch_url_local():
    """fetch_url against an in-process HTTP server (the reference's
    src/platform/url.cc role; no external egress needed)."""
    import http.server
    import threading

    from cyberether_tpu.utils.platform import fetch_url

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"payload-ok"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        got = fetch_url(f"http://127.0.0.1:{srv.server_port}/x",
                        timeout=5.0)
        assert got == b"payload-ok"
    finally:
        srv.shutdown()
