"""bf16 fast path vs f32 parity-path consistency."""

import numpy as np
import pytest

from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all


def _style(cfg, seed=7):
    rng = np.random.default_rng(seed)
    return VoiceStyle(
        rng.standard_normal(
            (1, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
        ).astype(np.float32),
        rng.standard_normal(
            (1, cfg.dp.style.n_style, cfg.dp.style.style_value_dim)
        ).astype(np.float32),
    )


def test_bf16_tracks_f32(tiny_config):
    """Same params/noise: the bf16 fast path must stay close to f32 —
    durations within 2% and waveform correlation > 0.98 (bf16 has 8
    mantissa bits; exact equality is not expected)."""
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    style = _style(tiny_config)
    text = ["A precision comparison sentence."]

    outs = {}
    for prec in ("f32", "bf16"):
        eng = SynthesisEngine(params, tiny_config, proc, precision=prec,
                              seed=0, egress_format="f32")
        # injected noise so both paths share the latent sample
        w0, d0 = eng.batch(text, ["en"], style, total_step=2)
        t = w0.shape[1] // tiny_config.chunk_size
        noise = np.random.default_rng(5).standard_normal(
            (1, t, tiny_config.latent_channels)).astype(np.float32)
        outs[prec] = eng.infer_batch(text, ["en"], style, 2, 1.05, noise=noise)

    (wf, df), (wb, db) = outs["f32"], outs["bf16"]
    assert abs(df[0] - db[0]) / df[0] < 0.02
    n = min(wf.shape[1], wb.shape[1])
    a, b = wf[0, :n], wb[0, :n]
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.98, f"bf16/f32 waveform correlation {corr}"


class TestAudioMetrics:
    """Perceptual metric sanity (utils.audio_metrics): the precision-ladder
    gate must measure quantization damage in a perceptual domain, not raw
    sample SNR (VERDICT r2 item 7)."""

    @staticmethod
    def _speechlike(n=48000, sr=16000, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sr
        f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
        x = sum(np.sin(2 * np.pi * k * np.cumsum(f0) / sr) / k
                for k in range(1, 6))
        env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))
        return (0.3 * x * env + 0.01 * rng.standard_normal(n)).astype(
            np.float32)

    def test_identity_is_perfect(self):
        from supertonic_tpu.utils.audio_metrics import log_mel_snr, mcd

        x = self._speechlike()
        assert mcd(x, x, 16000) == 0.0
        assert log_mel_snr(x, x, 16000) == float("inf")

    def test_monotone_in_noise(self):
        from supertonic_tpu.utils.audio_metrics import log_mel_snr, mcd

        x = self._speechlike()
        rng = np.random.default_rng(1)
        n = rng.standard_normal(x.size).astype(np.float32)
        prev_mcd, prev_snr = 0.0, float("inf")
        for lvl in (1e-4, 1e-3, 1e-2):
            y = x + lvl * n
            m, s = mcd(x, y, 16000), log_mel_snr(x, y, 16000)
            assert m > prev_mcd and s < prev_snr
            prev_mcd, prev_snr = m, s

    def test_mulaw_band(self):
        """G.711 mu-law is telephony-grade: measured ~1.6 dB MCD on
        speech-like material with quiet passages — audibly 'subtle', far
        from broken. The metric must land it in that band (this is the
        basis for the precision policy's 'mu-law is an opt-in latency
        point, not the default' stance, docs/PERFORMANCE.md)."""
        from supertonic_tpu.utils.audio_metrics import log_mel_snr, mcd
        from supertonic_tpu.utils.mulaw import decode, encode

        x = self._speechlike()
        y = decode(encode(x))
        assert 0.5 < mcd(x, y, 16000) < 2.5
        assert log_mel_snr(x, y, 16000) > 20.0

    def test_ladder_report_shape(self):
        from supertonic_tpu.utils.audio_metrics import precision_ladder_report

        x = self._speechlike()
        rep = precision_ladder_report(
            x, {"noisy": x + 1e-3, "same": x.copy()}, 16000)
        assert set(rep) == {"noisy", "same"}
        assert rep["same"]["mcd_db"] == 0.0
        assert rep["noisy"]["wav_snr_db"] > 40


def test_bf16_precision_ladder_floor(tiny_config):
    """The serving default (bf16) must stay under 1.0 dB MCD vs f32 on the
    same noise — the perceptual floor the precision policy commits to
    (docs/PERFORMANCE.md precision ladder)."""
    from supertonic_tpu.utils.audio_metrics import mcd

    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    style = _style(tiny_config)
    text = ["A perceptual floor sentence for the ladder."]
    outs = {}
    for prec in ("f32", "bf16"):
        eng = SynthesisEngine(params, tiny_config, proc, precision=prec,
                              seed=0, egress_format="f32")
        w0, _ = eng.batch(text, ["en"], style, total_step=2)
        t = w0.shape[1] // tiny_config.chunk_size
        noise = np.random.default_rng(5).standard_normal(
            (1, t, tiny_config.latent_channels)).astype(np.float32)
        outs[prec], _ = eng.infer_batch(text, ["en"], style, 2, 1.05,
                                        noise=noise)
    val = mcd(outs["f32"][0], outs["bf16"][0], tiny_config.sample_rate)
    assert val < 1.0, f"bf16 MCD {val:.3f} dB exceeds the 1.0 dB floor"


def test_mulaw_roundtrip():
    from supertonic_tpu.utils.mulaw import decode, encode

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(10000) * 0.2).clip(-1, 1).astype(np.float32)
    y = decode(encode(x))
    # companded 8-bit: small signals keep ~1% accuracy
    err = np.abs(y - x)
    assert err.max() < 0.02
    snr = 10 * np.log10((x**2).mean() / ((y - x) ** 2).mean())
    assert snr > 30, f"mu-law SNR {snr:.1f} dB"


def test_mulaw_device_host_parity_power_of_two():
    """Device and host encoders must agree bit-for-bit, ESPECIALLY at
    power-of-two segment boundaries where float log2 disagreed (ADVICE r1):
    mag = 256..16384 <=> pcm = 2**k - 0x84."""
    import jax

    from supertonic_tpu.engine.synthesis import _mulaw_encode
    from supertonic_tpu.utils.mulaw import encode

    edges = np.array([2.0**k - 0x84 for k in range(8, 15)], np.float64)
    vals = np.concatenate([edges - 1, edges, edges + 1,
                           np.linspace(0, 32000, 997)])
    x = np.concatenate([vals, -vals]).astype(np.float32) / 32767.0
    host = encode(x)
    dev = np.asarray(jax.jit(_mulaw_encode)(x))
    np.testing.assert_array_equal(dev, host)


def test_mulaw_engine_egress(tiny_config):
    from supertonic_tpu.engine import SynthesisEngine
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    style = _style(tiny_config)
    f32 = SynthesisEngine(params, tiny_config, proc, precision="f32",
                          seed=0, egress_format="f32")
    mul = SynthesisEngine(params, tiny_config, proc, precision="f32",
                          seed=0, egress_format="mulaw")
    text = ["Mu law egress check."]
    w1, d1 = f32.batch(text, ["en"], style, total_step=2)
    w2, d2 = mul.batch(text, ["en"], style, total_step=2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    assert w2.dtype == np.float32  # decoded on host
    n = min(w1.shape[1], w2.shape[1])
    corr = float(np.corrcoef(w1[0, :n], w2[0, :n])[0, 1])
    assert corr > 0.99, corr
