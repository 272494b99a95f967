import io

import numpy as np

from supertonic_tpu.utils import read_wav, wav_bytes, write_wav


def test_pcm16_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "a.wav"
    write_wav(str(path), wav, sr)
    out, out_sr = read_wav(str(path))
    assert out_sr == sr
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, wav, atol=1e-4)


def test_float32_roundtrip():
    sr = 44100
    wav = np.random.default_rng(0).standard_normal(1000).astype(np.float32) * 0.1
    buf = io.BytesIO(wav_bytes(wav, sr, fmt="float32"))
    out, out_sr = read_wav(buf)
    assert out_sr == sr
    np.testing.assert_array_equal(out, wav)


def test_clipping():
    data = wav_bytes(np.array([2.0, -2.0], dtype=np.float32), 8000)
    out, _ = read_wav(io.BytesIO(data))
    np.testing.assert_allclose(out, [1.0, -1.0], atol=1e-4)


def test_profiler_windows_bounded():
    """Percentile sample windows must not grow with uptime (a long-lived
    server would otherwise leak ~8 bytes/request forever); totals keep
    counting past the window."""
    from supertonic_tpu.utils.timing import StageProfiler

    p = StageProfiler()
    for i in range(25_000):
        p.record_request_latency(float(i % 7))
    p.record_ttfa(0.1)
    s = p.summary()
    assert s["requests"] == 25_000          # total keeps counting
    assert len(p.latencies_s) == 10_000     # window stays bounded
    assert s["streams"] == 1
    assert s["latency_p50_s"] >= 0.0
