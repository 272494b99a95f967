"""Serving over the ONNX graph-executor backend (engine/onnx_adapter.py).

A fetched-but-unconverted asset bundle (four graphs + tts.json + indexer, no
params.npz) must be servable through the FULL stack — TTS(), the HTTP
service with the continuous batcher, streaming — with zero conversion. The
synthetic four-graph bundle from test_onnx_pipeline stands in for the real
assets (same §2.2 I/O contract)."""

import io
import threading

import httpx
import numpy as np
import pytest

from test_onnx_pipeline import onnx_dir  # noqa: F401  (module-scoped fixture)

from supertonic_tpu import TTS
from supertonic_tpu.engine.onnx_adapter import OnnxEngineAdapter
from supertonic_tpu.utils import read_wav


@pytest.fixture(scope="module")
def tts_onnx(onnx_dir):  # noqa: F811
    # this module tests the reference-orchestration ADAPTER specifically;
    # the default for graph bundles is the fused engine backend
    # (tests/test_onnx_backend.py)
    import os

    os.environ["TTS_ONNX_FUSED"] = "0"
    try:
        return TTS(onnx_dir)
    finally:
        del os.environ["TTS_ONNX_FUSED"]


def test_tts_selects_executor_backend(tts_onnx):
    assert isinstance(tts_onnx.engine, OnnxEngineAdapter)
    assert tts_onnx.cfg.sample_rate == 80  # tts.json was honored


def test_synthesize_via_adapter(tts_onnx):
    style = tts_onnx.get_voice_style("M1")
    wav, dur = tts_onnx.synthesize("Hello adapter.", style, total_step=2)
    assert wav.shape[0] == 1 and wav.shape[1] > 0
    assert float(dur[0]) > 0
    assert np.isfinite(wav).all()


def test_batch_and_stream_via_adapter(tts_onnx):
    style = tts_onnx.get_voice_style("M1")
    wavs, durs = tts_onnx.synthesize_batch(
        ["One sentence.", "And a second one."], ["en", "en"],
        style.tile(2), total_step=2)
    assert wavs.shape[0] == 2
    assert np.all(np.asarray(durs) > 0)

    long_text = " ".join(["This sentence pads out the stream."] * 20)
    got = list(tts_onnx.engine.stream("en" and long_text, "en", style,
                                      total_step=2))
    assert len(got) >= 2  # chunker engaged, one yield per chunk
    for w, d in got:
        assert len(w) == int(tts_onnx.sample_rate * d) or len(w) > 0


def test_progress_callback_via_adapter(tts_onnx):
    style = tts_onnx.get_voice_style("M1")
    seen = []
    wav, dur = tts_onnx.engine.infer_with_progress(
        "Progress check.", "en", style, total_step=3,
        progress_callback=lambda s, t: seen.append((s, t)))
    assert seen == [(1, 3), (2, 3), (3, 3)]
    assert wav.shape[0] == 1 and float(dur[0]) > 0


def test_injected_noise_path(tts_onnx):
    """Parity-harness surface: identical injected noise -> identical audio."""
    style = tts_onnx.get_voice_style("M1")
    rng = np.random.default_rng(0)
    # reference noise layout: [B, latent_dim*ccf, T] (py/helper.py:161-175)
    noise = rng.standard_normal((1, 6, 64)).astype(np.float32)
    w1, d1 = tts_onnx.engine.infer_batch(
        ["Same noise."], ["en"], style, total_step=2, noise=noise)
    w2, d2 = tts_onnx.engine.infer_batch(
        ["Same noise."], ["en"], style, total_step=2, noise=noise)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(d1, d2)


def test_http_service_over_executor_backend(onnx_dir):  # noqa: F811
    from supertonic_tpu.serve.http_server import make_server

    tts = TTS(onnx_dir)
    server = make_server(tts, "127.0.0.1", 0)  # batcher ON
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        r = httpx.get(f"{base}/health")
        assert r.status_code == 200

        r = httpx.post(f"{base}/tts",
                       json={"text": "Served from real graphs.",
                             "total_step": 2}, timeout=120)
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("audio/wav")
        wav, sr = read_wav(io.BytesIO(r.content))
        assert sr == 80 and len(wav) > 0

        r = httpx.post(f"{base}/tts/stream",
                       json={"text": "Streaming over the executor backend.",
                             "total_step": 2}, timeout=120)
        assert r.status_code == 200
        assert len(r.content) > 44  # WAV header + audio

        m = httpx.get(f"{base}/metrics").json()
        assert m["requests"] >= 1
        assert m["batcher"]["batches"] >= 1
    finally:
        server.shutdown()
        server.service.close()
