"""Pod-serving router (serve/router.py): health checks, least-pending
dispatch, retry on host loss. Two real backend servers (tiny engines) run
in-process; a third "dead" backend exercises failover."""

import io
import threading

import httpx
import numpy as np
import pytest

from supertonic_tpu import TTS
from supertonic_tpu.assets import Assets
from supertonic_tpu.engine import SynthesisEngine
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all
from supertonic_tpu.serve.http_server import make_server
from supertonic_tpu.serve.router import (
    NoBackendAvailable,
    Router,
    make_router_server,
)
from supertonic_tpu.utils import read_wav


def _make_backend(tiny_config):
    params = init_all(0, tiny_config)
    tts = TTS.__new__(TTS)
    tts.assets = Assets(tiny_config, params,
                        UnicodeProcessor(build_default_indexer()), None)
    tts.cfg = tiny_config
    tts.engine = SynthesisEngine(params, tiny_config, tts.assets.processor,
                                 precision="f32")
    server = make_server(tts, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, f"http://127.0.0.1:{server.server_address[1]}"


@pytest.fixture(scope="module")
def pod(tiny_config):
    """Two live backends + a router front door."""
    servers, urls = [], []
    for _ in range(2):
        s, u = _make_backend(tiny_config)
        servers.append(s)
        urls.append(u)
    router = Router(urls, health_interval_s=0.2, failure_threshold=1)
    router.check_health()
    front = make_router_server(router, "127.0.0.1", 0)
    threading.Thread(target=front.serve_forever, daemon=True).start()
    front_url = f"http://127.0.0.1:{front.server_address[1]}"
    yield front_url, router, servers, urls
    front.shutdown()
    router.close()
    for s in servers:
        s.shutdown()
        s.service.close()


def test_router_health_aggregate(pod):
    front_url, router, _servers, urls = pod
    r = httpx.get(f"{front_url}/health")
    assert r.status_code == 200
    body = r.json()
    assert body["status"] == "ok"
    assert set(body["backends"]) == set(urls)
    assert all(b["healthy"] for b in body["backends"].values())


def test_router_forwards_tts(pod):
    front_url, router, _servers, _urls = pod
    r = httpx.post(f"{front_url}/tts",
                   json={"text": "Hello router.", "total_step": 2},
                   timeout=120)
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("audio/wav")
    wav, sr = read_wav(io.BytesIO(r.content))
    assert len(wav) > 0


def test_router_spreads_load(pod):
    front_url, router, _servers, _urls = pod

    results = []

    def hit():
        r = httpx.post(f"{front_url}/tts",
                       json={"text": "Load spread test.", "total_step": 2},
                       timeout=120)
        results.append(r.status_code)

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 8
    served = [b.requests for b in router.backends]
    # least-pending dispatch must not starve a healthy backend entirely
    assert all(n > 0 for n in served), served


def test_router_client_errors_not_retried(pod):
    front_url, router, _servers, _urls = pod
    before = [b.retries_absorbed for b in router.backends]
    r = httpx.post(f"{front_url}/tts", json={"text": "Hi.", "lang": "xx"})
    assert r.status_code == 400
    assert [b.retries_absorbed for b in router.backends] == before


def test_router_retries_dead_backend(tiny_config):
    """A pool with one dead host: requests transparently fail over."""
    server, live_url = _make_backend(tiny_config)
    try:
        router = Router(["http://127.0.0.1:9", live_url],
                        failure_threshold=1)
        status, hdrs, payload, backend = router.forward(
            "POST", "/tts",
            b'{"text": "Failover works.", "total_step": 2}',
            headers={"Content-Type": "application/json"},
        )
        assert status == 200
        assert backend == live_url
        dead = router.backends[0]
        assert not dead.healthy
        assert dead.retries_absorbed >= 1
        # health now reports degraded
        code, body = router.health()
        assert code == 200 and body["status"] == "degraded"
    finally:
        server.shutdown()
        server.service.close()


def test_router_all_dead_503(tiny_config):
    router = Router(["http://127.0.0.1:9"], failure_threshold=1,
                    max_attempts=2)
    with pytest.raises(NoBackendAvailable):
        router.forward("POST", "/tts", b"{}")
    code, body = router.health()
    assert code == 503
    assert body["status"] == "unavailable"


def test_router_recovery(tiny_config):
    """An ejected backend returns to rotation once /health succeeds."""
    server, url = _make_backend(tiny_config)
    try:
        router = Router([url], failure_threshold=1)
        router.backends[0].mark_failed(1)
        assert not router.backends[0].healthy
        router.check_health()
        assert router.backends[0].healthy
    finally:
        server.shutdown()
        server.service.close()


def test_router_oversized_body_413(pod):
    front_url, router, servers, urls = pod
    big = b'{"text": "' + b"a" * (9 * 1024 * 1024) + b'"}'
    r = httpx.post(f"{front_url}/tts", content=big,
                   headers={"content-type": "application/json"}, timeout=30)
    assert r.status_code == 413


def test_router_streams_tts_chunked(pod):
    """/tts/stream through the front door is pass-through streamed (chunked
    transfer, first bytes before completion), with identical audio to a
    direct backend stream."""
    front_url, router, servers, urls = pod
    req = {"text": "Streaming through the router, sentence one. "
                   "And sentence two follows it.", "total_step": 2}
    with httpx.stream("POST", f"{front_url}/tts/stream", json=req,
                      timeout=300) as r:
        assert r.status_code == 200
        assert r.headers.get("transfer-encoding") == "chunked"
        routed = b"".join(r.iter_bytes())
    assert routed[:4] == b"RIFF" and len(routed) > 44


def test_router_forwards_voices(pod):
    front_url, router, servers, urls = pod
    r = httpx.get(f"{front_url}/voices", timeout=30)
    assert r.status_code == 200
    assert "M1" in r.json()["voices"]


def test_router_malformed_content_length_400(pod):
    import socket
    from urllib.parse import urlparse

    u = urlparse(pod[0])
    with socket.create_connection((u.hostname, u.port), timeout=10) as s:
        s.sendall(b"POST /tts HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: oops\r\n\r\n")
        resp = s.recv(4096)
    assert resp.startswith(b"HTTP/1.1 400")


def test_router_backend_dies_mid_stream_truncates(pod):
    """A backend failure after stream headers must truncate the client's
    chunked stream (no terminator), not crash the router handler thread."""
    front_url, router, servers, urls = pod
    fake_chunks = [b"PART1", b"PART2"]

    class _FakeResp:
        def __init__(self):
            self._i = 0

        def read1(self, n):
            if self._i < len(fake_chunks):
                self._i += 1
                return fake_chunks[self._i - 1]
            raise ConnectionResetError("backend gone")

    class _FakeHandle:
        def __init__(self, backend):
            import supertonic_tpu.serve.router as rt
            self._h = rt._StreamHandle(
                type("C", (), {"close": lambda self: None})(),
                _FakeResp(), backend)

        def chunks(self):
            return self._h.chunks()

        def close(self):
            self._h.close()

    orig = router.forward_stream

    def fake_forward_stream(method, path, body, headers=None):
        b = router.backends[0]
        b.acquire()
        return 200, {"Content-Type": "audio/wav"}, _FakeHandle(b), b.url

    try:
        router.forward_stream = fake_forward_stream
        got = bytearray()
        with pytest.raises(httpx.HTTPError):
            with httpx.stream("POST", f"{front_url}/tts/stream",
                              json={"text": "x"}, timeout=30) as r:
                assert r.status_code == 200
                for chunk in r.iter_bytes():
                    got.extend(chunk)
        assert bytes(got).startswith(b"PART1")
        # pending slot released despite the failure
        assert router.backends[0].pending == 0
    finally:
        router.forward_stream = orig


def test_router_forwards_openai_speech(pod):
    r = httpx.post(f"{pod[0]}/v1/audio/speech",
                   json={"input": "Routed speech.", "voice": "echo",
                         "total_step": 2}, timeout=120)
    assert r.status_code == 200
    assert r.content[:4] == b"RIFF"


def test_pick_least_expected_wait_and_probe_recovery():
    """Dispatch policy unit test (no HTTP): a backend with a 10x EWMA stops
    receiving traffic even while idle (pure least-pending would re-feed
    it), and the idle-probe window re-admits it so a recovered straggler
    can prove itself again."""
    import time as _time

    router = Router(["http://a:1", "http://b:1"], probe_after_s=0.3)
    slow, fast = router.backends
    now = _time.time()
    slow.last_pick_t = fast.last_pick_t = now  # both freshly routed
    slow.ewma_s, fast.ewma_s = 2.0, 0.2

    # idle straggler is NOT picked: expected wait 1*2.0 > 1*0.2
    assert router.pick() is fast
    # even with a queue on the fast backend, waiting there is cheaper
    # until the queue is ~10 deep
    fast.pending = 5
    assert router.pick() is fast
    fast.pending = 12
    assert router.pick() is slow  # queueing finally costs more than 2.0s
    slow.last_pick_t = now  # undo the pick bookkeeping
    fast.pending = 0

    # probe: once the straggler has sat unrouted past probe_after_s it gets
    # exactly one request to re-measure itself...
    _time.sleep(0.35)
    fast.last_pick_t = _time.time()
    assert router.pick() is slow
    # ...and not a second while the first is unresolved
    slow.pending = 1
    assert router.pick() is fast
    slow.pending = 0

    # the probes measure a recovered host: each one decays the stale
    # estimate by 0.7x, so traffic returns over a handful of probe windows
    for _ in range(8):
        slow.observe_latency(0.05)
    assert slow.ewma_s < fast.ewma_s
    assert router.pick() is slow


def test_pick_unproven_backend_not_stacked():
    """A backend with no latency measurement yet gets ONE optimistic
    request, not a pile (a cold straggler would otherwise absorb several
    requests before its first measurement lands)."""
    router = Router(["http://a:1", "http://b:1"], probe_after_s=1e9)
    a, b = router.backends
    b.ewma_s = 0.2
    assert router.pick() is a  # optimistic: assumed as fast as best known
    a.pending = 1  # first request still in flight
    assert router.pick() is b  # not stacked
