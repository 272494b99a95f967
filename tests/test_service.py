"""Service tests (wire contract of reference py/service.py) against the
stdlib HTTP server via httpx. The FastAPI variant (serve/app.py) shares the
same contract and is exercised when fastapi is installed."""

import io
import threading
import zipfile

import httpx
import numpy as np
import pytest

from supertonic_tpu import TTS
from supertonic_tpu.assets import Assets
from supertonic_tpu.engine import SynthesisEngine
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all
from supertonic_tpu.serve.http_server import make_server
from supertonic_tpu.utils import read_wav


@pytest.fixture(scope="module")
def tts_server(tiny_config):
    params = init_all(0, tiny_config)
    tts = TTS.__new__(TTS)
    tts.assets = Assets(tiny_config, params,
                        UnicodeProcessor(build_default_indexer()), None)
    tts.cfg = tiny_config
    tts.engine = SynthesisEngine(params, tiny_config, tts.assets.processor,
                                 precision="f32")
    server = make_server(tts, "127.0.0.1", 0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", server
    server.shutdown()
    server.service.close()


@pytest.fixture(scope="module")
def base_url(tts_server):
    return tts_server[0]


def test_health(base_url):
    r = httpx.get(f"{base_url}/health")
    assert r.status_code == 200
    assert r.json() == {"status": "ok"}


def test_single_tts_returns_wav(base_url):
    r = httpx.post(f"{base_url}/tts",
                   json={"text": "Hello service.", "total_step": 2},
                   timeout=120)
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("audio/wav")
    wav, sr = read_wav(io.BytesIO(r.content))
    assert sr == 16000
    assert len(wav) > 0


def test_batch_returns_zip(base_url):
    r = httpx.post(f"{base_url}/tts", json={
        "text": ["First one.", "Second one."],
        "lang": ["en", "en"],
        "voice_style": ["M1", "F1"],
        "batch": True,
        "total_step": 2,
    }, timeout=120)
    assert r.status_code == 200
    assert r.headers["content-type"] == "application/zip"
    zf = zipfile.ZipFile(io.BytesIO(r.content))
    assert len(zf.namelist()) == 2


def test_invalid_lang_400(base_url):
    r = httpx.post(f"{base_url}/tts", json={"text": "Hi.", "lang": "de"})
    assert r.status_code == 400
    assert "Invalid language" in r.json()["detail"]


def test_batch_length_mismatch_400(base_url):
    r = httpx.post(f"{base_url}/tts", json={
        "text": ["a", "b"], "lang": ["en"], "voice_style": ["M1"],
        "batch": True,
    })
    assert r.status_code == 400


def test_nonbatch_multiple_texts_400(base_url):
    r = httpx.post(f"{base_url}/tts", json={"text": ["a", "b"]})
    assert r.status_code == 400


def test_step_bounds_422(base_url):
    for ts in (0, 51):
        r = httpx.post(f"{base_url}/tts", json={"text": "Hi.", "total_step": ts})
        assert r.status_code == 422


def test_unknown_style_400(base_url):
    r = httpx.post(f"{base_url}/tts", json={"text": "Hi.", "voice_style": "Z9"})
    assert r.status_code == 400


def test_missing_text_422(base_url):
    r = httpx.post(f"{base_url}/tts", json={})
    assert r.status_code == 422


def test_metrics(base_url):
    r = httpx.get(f"{base_url}/metrics")
    assert r.status_code == 200
    assert "rtf" in r.json()


def test_concurrent_requests(base_url):
    results = []

    def hit():
        r = httpx.post(f"{base_url}/tts",
                       json={"text": "Concurrency check.", "total_step": 2},
                       timeout=180)
        results.append(r.status_code)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 4


def test_streaming_endpoint(base_url):
    long_text = " ".join(
        f"Streaming sentence number {i} with several more words attached."
        for i in range(8)
    )
    pcm = bytearray()
    with httpx.stream(
        "POST", f"{base_url}/tts/stream",
        json={"text": long_text, "total_step": 2}, timeout=300,
    ) as r:
        assert r.status_code == 200
        assert r.headers["content-type"] == "audio/wav"
        for chunk in r.iter_bytes():
            pcm.extend(chunk)
    # RIFF header + at least a second of 16 kHz PCM16
    assert pcm[:4] == b"RIFF" and pcm[8:12] == b"WAVE"
    assert len(pcm) > 44 + 16000 * 2
    samples = np.frombuffer(bytes(pcm[44:]), dtype="<i2")
    assert np.abs(samples).max() > 0


def test_streaming_rejects_batch(base_url):
    r = httpx.post(f"{base_url}/tts/stream",
                   json={"text": ["a", "b"], "lang": ["en", "en"],
                         "voice_style": ["M1", "M1"]})
    assert r.status_code == 400


def test_streaming_invalid_lang(base_url):
    r = httpx.post(f"{base_url}/tts/stream", json={"text": "Hi.", "lang": "xx"})
    assert r.status_code == 400


def test_type_validation_422(base_url):
    """Malformed field types must produce a clean 422, never a stack trace
    with no response (ADVICE r1)."""
    bad = [
        {"text": "hi", "silence_duration": "x"},
        {"text": "hi", "crossfade_duration": None},
        {"text": 42},
        {"text": ["ok"], "lang": [7]},
        {"text": "hi", "speed": "fast"},
        {"text": "hi", "total_step": 2.5},
        {"text": "hi", "voice_style": 3},
    ]
    for body in bad:
        r = httpx.post(f"{base_url}/tts", json=body)
        assert r.status_code == 422, body
        assert "detail" in r.json()


def test_http_concurrency_soak_batches(tts_server):
    """VERDICT r1 item 3 done-criterion: 40 concurrent HTTP requests flow
    through the ContinuousBatcher — fewer device batches than requests, all
    responses valid WAVs, and /metrics populated (p50 latency, requests)."""
    base_url, server = tts_server
    service = server.service
    assert service.batcher is not None
    start_batches = service.batcher.stats["batches"]
    start_requests = service.batcher.stats["requests"]

    texts = [
        "Short one.",
        "A medium length sentence for the soak test run.",
        "This is a somewhat longer sentence so that multiple text "
        "buckets are exercised by the grouping logic.",
    ]
    results = []

    def hit(i):
        r = httpx.post(f"{base_url}/tts", json={
            "text": texts[i % len(texts)], "total_step": 2,
        }, timeout=300)
        results.append((r.status_code, r.content[:4]))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(40)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert [s for s, _ in results] == [200] * 40
    assert all(head == b"RIFF" for _, head in results)
    new_requests = service.batcher.stats["requests"] - start_requests
    new_batches = service.batcher.stats["batches"] - start_batches
    assert new_requests == 40
    assert new_batches < new_requests  # coalescing actually happened

    m = httpx.get(f"{base_url}/metrics").json()
    assert m["requests"] >= 40
    assert m["latency_p50_s"] > 0
    assert m["batcher"]["batched_requests"] >= 40


def test_stream_records_ttfa(tts_server):
    base_url, server = tts_server
    long_text = " ".join(
        f"Yet another streaming sentence number {i} for time to first audio."
        for i in range(6)
    )
    with httpx.stream("POST", f"{base_url}/tts/stream",
                      json={"text": long_text, "total_step": 2},
                      timeout=300) as r:
        assert r.status_code == 200
        next(r.iter_bytes())  # first audio arrived
    m = httpx.get(f"{base_url}/metrics").json()
    assert m["streams"] >= 1
    assert m["ttfa_p50_s"] > 0


def test_structured_request_logging(base_url, capfd):
    import io
    from supertonic_tpu.utils.logging import JsonLogger

    buf = io.StringIO()
    lg = JsonLogger(stream=buf, name="t")
    lg.info("hello", n=3)
    import json as _json

    rec = _json.loads(buf.getvalue())
    assert rec["event"] == "hello" and rec["n"] == 3 and rec["level"] == "info"


def test_oversized_body_413(base_url):
    # a huge Content-Length must be refused before buffering, not OOM the
    # handler thread
    big = b'{"text": "' + b"a" * (9 * 1024 * 1024) + b'"}'
    r = httpx.post(f"{base_url}/tts", content=big,
                   headers={"content-type": "application/json"}, timeout=30)
    assert r.status_code == 413
    assert "exceeds" in r.json()["detail"]


def test_voices_endpoint(base_url):
    r = httpx.get(f"{base_url}/voices")
    assert r.status_code == 200
    body = r.json()
    assert body["voices"] and "M1" in body["voices"]
    assert body["source"] in ("presets", "style_dir")


def test_style_path_rejected_over_http(base_url, tmp_path):
    """voice_style over HTTP is a NAME, not a path — a path would let any
    readable JSON on the host be loaded as a style."""
    for bad in ("../styles/M1", "/tmp/anything.json", ".hidden"):
        r = httpx.post(f"{base_url}/tts",
                       json={"text": "x", "voice_style": bad}, timeout=60)
        assert r.status_code == 400, (bad, r.status_code)


def test_empty_stream_chunk_not_a_terminator(tts_server):
    """A zero-length synthesized chunk must not emit the chunked-transfer
    terminator mid-stream (0-length chunk == end-of-response in HTTP/1.1)."""
    base_url, server = tts_server
    orig = server.service.stream_wav_bytes
    try:
        server.service.stream_wav_bytes = lambda req: iter(
            [b"HEAD", b"", b"TAIL"])
        with httpx.stream("POST", f"{base_url}/tts/stream",
                          json={"text": "x"}, timeout=30) as r:
            assert r.status_code == 200
            body = b"".join(r.iter_bytes())
        assert body == b"HEADTAIL"
    finally:
        server.service.stream_wav_bytes = orig


def test_stream_failure_after_headers_aborts_cleanly(tts_server):
    """A synthesis error after the 200/chunked headers are out must abort
    the connection, not write a JSON 500 into the body."""
    base_url, server = tts_server

    def boom(req):
        yield b"PARTIAL"
        raise RuntimeError("device fell over")

    orig = server.service.stream_wav_bytes
    try:
        server.service.stream_wav_bytes = boom
        got = bytearray()
        with pytest.raises(httpx.HTTPError):
            with httpx.stream("POST", f"{base_url}/tts/stream",
                              json={"text": "x"}, timeout=30) as r:
                for chunk in r.iter_bytes():
                    got.extend(chunk)
        assert b"500" not in got and b"detail" not in got
    finally:
        server.service.stream_wav_bytes = orig


def test_malformed_content_length_400(base_url):
    import socket
    from urllib.parse import urlparse

    u = urlparse(base_url)
    with socket.create_connection((u.hostname, u.port), timeout=10) as s:
        s.sendall(b"POST /tts HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: abc\r\n\r\n")
        resp = s.recv(4096)
    assert resp.startswith(b"HTTP/1.1 400")


def test_openai_speech_endpoint(base_url):
    r = httpx.post(f"{base_url}/v1/audio/speech",
                   json={"input": "Hello from the compatible surface.",
                         "voice": "alloy", "total_step": 2}, timeout=120)
    assert r.status_code == 200
    assert r.headers["content-type"] == "audio/wav"
    assert r.content[:4] == b"RIFF"
    assert len(r.content) > 44 + 8000


def test_openai_speech_pcm_format(base_url):
    wav = httpx.post(f"{base_url}/v1/audio/speech",
                     json={"input": "Same words twice.", "voice": "M1",
                           "total_step": 2}, timeout=120)
    pcm = httpx.post(f"{base_url}/v1/audio/speech",
                     json={"input": "Same words twice.", "voice": "M1",
                           "total_step": 2, "response_format": "pcm"},
                     timeout=120)
    assert pcm.status_code == 200
    assert pcm.headers["content-type"] == "audio/pcm"
    assert pcm.content[:4] != b"RIFF"
    # pcm payload is exactly the wav payload minus the 44-byte RIFF header
    assert len(pcm.content) == len(wav.content) - 44


def test_wav_data_payload_chunk_walk():
    """PCM extraction walks the RIFF chunk list — it must survive an extra
    chunk before 'data' (a fixed 44-byte slice would return garbage)."""
    import struct

    from supertonic_tpu.serve.http_server import _wav_data_payload
    from supertonic_tpu.utils import wav_bytes

    samples = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    w = wav_bytes(samples, 80)
    assert _wav_data_payload(w) == w[44:]   # writer's canonical layout

    data = (samples * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 80, 160, 2, 16)
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOabcdef"
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + lst
            + b"data" + struct.pack("<I", len(data)) + data)
    assert _wav_data_payload(
        b"RIFF" + struct.pack("<I", len(body)) + body) == data

    with pytest.raises(Exception, match="data chunk"):
        _wav_data_payload(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_openai_speech_validation(base_url):
    cases = [
        ({"voice": "M1"}, 422),                       # missing input
        ({"input": ""}, 422),                         # empty input
        ({"input": "x", "response_format": "mp3"}, 400),
        ({"input": "x", "speed": 9.0}, 422),
        ({"input": "x", "speed": 0.1}, 422),
        ({"input": "x", "voice": "nope"}, 400),       # unknown preset
        ({"input": "x", "lang": "zz"}, 400),          # bad lang extension
    ]
    for body, want in cases:
        r = httpx.post(f"{base_url}/v1/audio/speech", json=body, timeout=60)
        assert r.status_code == want, (body, r.status_code, r.text)


def test_voice_style_blend_syntax(tts_server):
    base_url, server = tts_server
    svc = server.service
    s_blend = svc.get_style("M1+F1:0.25")
    s_m1 = svc.get_style("M1")
    s_f1 = svc.get_style("F1")
    np.testing.assert_allclose(
        s_blend.ttl, 0.75 * s_m1.ttl + 0.25 * s_f1.ttl, rtol=1e-6)
    # default weight 0.5
    s_half = svc.get_style("M2+F2")
    s_m2, s_f2 = svc.get_style("M2"), svc.get_style("F2")
    np.testing.assert_allclose(
        s_half.dp, 0.5 * s_m2.dp + 0.5 * s_f2.dp, rtol=1e-6)

    # over HTTP end-to-end
    r = httpx.post(f"{base_url}/tts",
                   json={"text": "Blended voice.", "total_step": 2,
                         "voice_style": "M1+F1:0.5"}, timeout=120)
    assert r.status_code == 200 and r.content[:4] == b"RIFF"

    for bad in ("M1+F1:1.5", "M1+", "+F1", "M1+F1+M2", "M1+F1:x",
                "M1+nope"):
        r = httpx.post(f"{base_url}/tts",
                       json={"text": "x", "voice_style": bad}, timeout=60)
        assert r.status_code == 400, (bad, r.status_code)


def test_openai_speech_lang_type_422(base_url):
    r = httpx.post(f"{base_url}/v1/audio/speech",
                   json={"input": "hi", "lang": 5}, timeout=60)
    assert r.status_code == 422


def test_nonbatcher_stream_does_not_hold_lock_for_slow_reader(tiny_config):
    """TTS_BATCHER=0 mode: the engine lock is held per chunk computation,
    never across client writes — a stalled stream consumer must not block
    a concurrent /tts."""
    from supertonic_tpu.serve.http_server import TTSService

    params = init_all(0, tiny_config)
    tts = TTS.__new__(TTS)
    tts.assets = Assets(tiny_config, params,
                        UnicodeProcessor(build_default_indexer()), None)
    tts.cfg = tiny_config
    tts.engine = SynthesisEngine(params, tiny_config, tts.assets.processor,
                                 precision="f32")
    svc = TTSService(tts, use_batcher=False)
    long_text = " ".join(
        f"Sentence number {i} with several words attached." for i in range(6))
    gen = svc.stream_chunks({"text": long_text, "lang": "en",
                             "voice_style": "M1", "total_step": 2,
                             "speed": 1.05, "batch": False,
                             "silence_duration": 0.3,
                             "crossfade_duration": 0.0})
    next(gen)  # first chunk synthesized; generator now SUSPENDED mid-stream

    done = threading.Event()

    def other_request():
        svc.synthesize({"text": "Quick one.", "lang": "en",
                        "voice_style": "M1", "total_step": 2, "speed": 1.05,
                        "batch": False, "silence_duration": 0.3,
                        "crossfade_duration": 0.0})
        done.set()

    t = threading.Thread(target=other_request, daemon=True)
    t.start()
    # with the lock held across the suspended yield this would deadlock
    # until the stream finished; 120 s >> one tiny-model synthesis
    assert done.wait(timeout=120), (
        "concurrent /tts blocked behind a suspended stream generator")
    list(gen)  # drain
    svc.close()


def test_demo_page_served_at_root(base_url):
    """GET / returns the built-in browser demo (the reference's web app
    capability — web/main.js:72-291 — as one dependency-free page)."""
    r = httpx.get(f"{base_url}/", timeout=30)
    assert r.status_code == 200
    assert r.headers["content-type"].startswith("text/html")
    body = r.text
    assert "/tts" in body and "/voices" in body and "<audio" in body
    # the page MUST send JSON content type (the FastAPI twin 422s on the
    # fetch default text/plain) and stream progressively via Web Audio
    # instead of buffering the whole response into a blob
    assert "'Content-Type': 'application/json'" in body
    assert "streamPlay" in body and "AudioContext" in body
    assert "getReader()" in body
