"""End-to-end engine tests on the tiny config (virtual CPU devices)."""

import numpy as np
import pytest

from supertonic_tpu.engine import SynthesisEngine, VoiceStyle, pick_bucket, stitch
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all


@pytest.fixture(scope="module")
def engine(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    return SynthesisEngine(params, tiny_config, proc, precision="f32", seed=0)


@pytest.fixture(scope="module")
def style(tiny_config):
    rng = np.random.default_rng(7)
    cfg = tiny_config
    return VoiceStyle(
        rng.standard_normal(
            (1, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
        ).astype(np.float32),
        rng.standard_normal(
            (1, cfg.dp.style.n_style, cfg.dp.style.style_value_dim)
        ).astype(np.float32),
    )


class TestBuckets:
    def test_pick_bucket(self):
        assert pick_bucket(5, (32, 64)) == 32
        assert pick_bucket(33, (32, 64)) == 64
        assert pick_bucket(65, (32, 64)) == 128  # rounds up by last step
        assert pick_bucket(0, (32, 64)) == 32


class TestStitch:
    def test_silence_join(self):
        w = [np.ones(100, np.float32), np.ones(100, np.float32) * 0.5]
        out, dur = stitch(w, [100 / 16000, 100 / 16000], 16000,
                          silence_duration=0.01)
        assert len(out) == 100 + 160 + 100
        assert (out[100:260] == 0).all()
        assert abs(dur - len(out) / 16000) < 1e-6

    def test_trim_before_join(self):
        # chunks are padded; stitch must trim to duration first (the Rust
        # behavior, rust/src/helper.rs:700-714 — the Python reference's
        # untrimmed concat is a bug we do not reproduce)
        w = [np.ones(200, np.float32)]
        out, _ = stitch(w, [100 / 16000], 16000)
        assert len(out) == 100

    def test_crossfade_join(self):
        w = [np.ones(200, np.float32), np.ones(200, np.float32)]
        out, _ = stitch(
            w, [200 / 16000, 200 / 16000], 16000, crossfade_duration=0.005
        )
        xf = 80  # 0.005 * 16000
        assert len(out) == 400 - xf
        # equal-power crossfade of two equal signals stays near 1
        assert np.abs(out).max() <= np.sqrt(2) + 1e-5
        assert out.min() > 0.9

    def test_empty(self):
        out, dur = stitch([], [], 16000)
        assert len(out) == 0 and dur == 0.0


class TestEngine:
    def test_batch_shapes(self, engine, tiny_config, style):
        texts = ["Hello there.", "A somewhat longer test sentence."]
        wav, dur = engine.batch(texts, ["en", "en"], style.tile(2))
        assert wav.shape[0] == 2
        assert wav.shape[1] % tiny_config.chunk_size == 0
        assert dur.shape == (2,)
        assert (dur > 0).all()

    def test_single_call(self, engine, style):
        wav, dur = engine("Hi world.", "en", style, total_step=2)
        assert wav.shape[0] == 1
        assert float(dur[0]) > 0

    def test_wav_covers_duration(self, engine, tiny_config, style):
        wav, dur = engine.batch(["Test sentence."], ["en"], style)
        assert wav.shape[1] >= int(tiny_config.sample_rate * float(dur[0]))

    def test_injected_noise_is_deterministic(self, engine, tiny_config, style):
        texts = ["Deterministic check."]
        # run once to learn the latent bucket, then inject fixed noise twice
        wav0, dur = engine.batch(texts, ["en"], style)
        t = wav0.shape[1] // tiny_config.chunk_size
        noise = np.random.default_rng(3).standard_normal(
            (1, t, tiny_config.latent_channels)
        ).astype(np.float32)
        w1, _ = engine.infer_batch(texts, ["en"], style, 5, 1.05, noise=noise)
        w2, _ = engine.infer_batch(texts, ["en"], style, 5, 1.05, noise=noise)
        np.testing.assert_array_equal(w1, w2)

    def test_device_noise_differs_between_calls(self, engine, style):
        w1, _ = engine.batch(["Same text."], ["en"], style)
        w2, _ = engine.batch(["Same text."], ["en"], style)
        assert np.abs(w1 - w2).max() > 0  # fresh key per request

    def test_style_batch_mismatch_raises(self, engine, style):
        with pytest.raises(AssertionError):
            engine.batch(["a", "b"], ["en", "en"], style)  # 2 texts, 1 style

    def test_trim_helper(self, engine, style):
        wav, dur = engine.batch(["Trim me."], ["en"], style)
        trimmed = engine.trim(wav, dur)
        assert len(trimmed[0]) == int(engine.cfg.sample_rate * float(dur[0]))


class TestTopLevelAPI:
    def test_tts_synthesize(self, tmp_path, tiny_config):
        # exercises the pypi-style API shape (reference py/example_pypi.py)
        from supertonic_tpu import TTS

        tts = TTS.__new__(TTS)  # build around tiny config without assets dir
        from supertonic_tpu.assets import Assets, synthesize_default_styles
        from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
        from supertonic_tpu.models import init_all as _init

        params = _init(0, tiny_config)
        tts.assets = Assets(tiny_config, params,
                            UnicodeProcessor(build_default_indexer()), None)
        tts.cfg = tiny_config
        tts.engine = SynthesisEngine(
            params, tiny_config, tts.assets.processor, precision="f32"
        )
        style = tts.get_voice_style("M4")
        wav, dur = tts.synthesize("Hello!", style, total_step=2)
        assert wav.shape[0] == 1
        out = tmp_path / "o.wav"
        tts.save_audio(wav, str(out))
        from supertonic_tpu.utils import read_wav

        w, sr = read_wav(str(out))
        assert sr == tiny_config.sample_rate


def test_infer_with_progress(engine, style):
    calls = []
    wav, dur = engine.infer_with_progress(
        "Progress callback check.", "en", style, total_step=3,
        progress_callback=lambda s, t: calls.append((s, t)),
    )
    assert calls == [(1, 3), (2, 3), (3, 3)]
    assert wav.shape[0] == 1
    assert float(dur[0]) > 0
    assert wav.shape[1] >= int(engine.cfg.sample_rate * float(dur[0]))


def test_warmup_compiles_lattice(tiny_config):
    from supertonic_tpu.engine import SynthesisEngine
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    eng = SynthesisEngine(init_all(0, tiny_config), tiny_config,
                          UnicodeProcessor(build_default_indexer()),
                          precision="f32")
    seen = []
    n = eng.warmup(batch_sizes=(1, 2), text_buckets=(32,),
                   total_steps=(2,), progress=lambda i, t: seen.append((i, t)))
    assert n == 2
    assert seen == [(1, 2), (2, 2)]
    # a request matching a warmed shape now runs without a new compile
    import numpy as np

    from supertonic_tpu.engine import VoiceStyle

    rng = np.random.default_rng(0)
    style = VoiceStyle(
        rng.standard_normal((1, 4, 16)).astype(np.float32),
        rng.standard_normal((1, 4, 16)).astype(np.float32))
    wav, dur = eng.infer_batch(["Warm check."], ["en"], style, total_step=2)
    assert wav.shape[0] == 1 and float(dur[0]) > 0


def test_warmup_does_not_pollute_metrics(tiny_config):
    from supertonic_tpu.engine import SynthesisEngine
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    eng = SynthesisEngine(init_all(0, tiny_config), tiny_config,
                          UnicodeProcessor(build_default_indexer()),
                          precision="f32")
    eng.warmup(batch_sizes=(1,), text_buckets=(32,), total_steps=(2,))
    s = eng.profiler.summary()
    assert s["requests"] == 0 and s["audio_seconds"] == 0


def test_style_device_cache_hits_on_content(tiny_config):
    """Fresh-but-identical VoiceStyle objects (tile/concat per request) must
    hit the device cache — identity keying missed every serving request
    (code review r2)."""
    import numpy as np

    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    eng = SynthesisEngine(init_all(0, tiny_config), tiny_config,
                          UnicodeProcessor(build_default_indexer()),
                          precision="f32")
    rng = np.random.default_rng(0)
    ttl = rng.standard_normal((1, 4, 16)).astype(np.float32)
    dp = rng.standard_normal((1, 4, 16)).astype(np.float32)
    a = VoiceStyle(ttl.copy(), dp.copy())
    b = VoiceStyle(ttl.copy(), dp.copy())  # different object, same content
    d1 = eng._device_style(a, 1)
    assert len(eng._style_dev_cache) == 1
    d2 = eng._device_style(b, 1)
    assert len(eng._style_dev_cache) == 1  # content hit, no second upload
    assert d1[0] is d2[0] and d1[1] is d2[1]
    # tiles of the same base also share one entry per (content, bucket)
    eng._device_style(a.tile(2), 2)
    eng._device_style(b.tile(2), 2)
    assert len(eng._style_dev_cache) == 2


def test_egress_tail_fetch_on_underestimate(tiny_config):
    """If the learned-rate estimate undershoots, the sliced egress must
    fetch the missing tail and still return full-length audio."""
    import numpy as np

    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    rng = np.random.default_rng(0)
    style = VoiceStyle(
        rng.standard_normal((1, 4, 16)).astype(np.float32),
        rng.standard_normal((1, 4, 16)).astype(np.float32))
    text = ["A tail fetch exercise sentence."]

    ok = SynthesisEngine(params, tiny_config, proc, precision="f32", seed=9)
    ok._pin_rate(1.0 / 11.0)
    w_ok, d_ok = ok.infer_batch(text, ["en"], style, total_step=2)

    low = SynthesisEngine(params, tiny_config, proc, precision="f32", seed=9)
    low._pin_rate(1.0 / 11.0)
    low._spc_margin = 0.25  # force a severe underestimate
    w_low, d_low = low.infer_batch(text, ["en"], style, total_step=2)

    np.testing.assert_allclose(d_ok, d_low, atol=1e-6)
    tail = low.profiler.counters.get("egress_tail_fetches", 0)
    overflow = low.profiler.counters.get("bucket_overflows", 0)
    assert tail >= 1 or overflow >= 1
    n = int(tiny_config.sample_rate * float(d_ok[0]))
    assert w_low.shape[1] >= n  # full audio despite the short first slice
    assert np.isfinite(w_low).all()
    if overflow == 0:
        # same latent bucket + same key sequence -> identical audio; an
        # overflow re-run draws fresh noise, so equality only holds here
        np.testing.assert_allclose(w_ok[0, :n], w_low[0, :n], atol=3e-5)


def test_overflow_exhaustion_raises(tiny_config, monkeypatch):
    """Persistent latent-bucket overflow must raise, never return silently
    truncated audio (VERDICT r1 weak #5)."""
    import numpy as np
    import pytest

    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle, buckets
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all

    eng = SynthesisEngine(init_all(0, tiny_config), tiny_config,
                          UnicodeProcessor(build_default_indexer()),
                          precision="f32", seed=1)
    rng = np.random.default_rng(1)
    style = VoiceStyle(
        rng.standard_normal((1, 4, 16)).astype(np.float32),
        rng.standard_normal((1, 4, 16)).astype(np.float32))
    # force every LATENT bucket pick to 1 frame: audio can never fit
    orig = buckets.pick_bucket
    lat = tuple(tiny_config.runtime.latent_buckets)

    def fake(v, ladder):
        return 1 if tuple(ladder) == lat else orig(v, ladder)

    monkeypatch.setattr(buckets, "pick_bucket", fake)
    with pytest.raises(RuntimeError, match="overflow"):
        eng.infer_batch(["An overflow that cannot fit."], ["en"], style,
                        total_step=2)
    assert eng.profiler.counters["bucket_overflow_exhausted"] == 1


class TestVoiceStyleBlend:
    def test_blend_endpoints_and_midpoint(self):
        from supertonic_tpu.engine import VoiceStyle

        rng = np.random.default_rng(0)
        a = VoiceStyle(rng.standard_normal((1, 2, 4)).astype(np.float32),
                       rng.standard_normal((1, 2, 4)).astype(np.float32))
        b = VoiceStyle(rng.standard_normal((1, 2, 4)).astype(np.float32),
                       rng.standard_normal((1, 2, 4)).astype(np.float32))
        np.testing.assert_array_equal(a.blend(b, 0.0).ttl, a.ttl)
        np.testing.assert_array_equal(a.blend(b, 1.0).dp, b.dp)
        mid = a.blend(b, 0.5)
        np.testing.assert_allclose(mid.ttl, (a.ttl + b.ttl) / 2, rtol=1e-6)
        assert mid.ttl.dtype == np.float32
        # distinct content => distinct device-style cache keys
        assert mid.fingerprint() != a.fingerprint() != b.fingerprint()

    def test_blend_shape_mismatch_raises(self):
        from supertonic_tpu.engine import VoiceStyle

        rng = np.random.default_rng(1)
        a = VoiceStyle(rng.standard_normal((1, 2, 4)).astype(np.float32),
                       rng.standard_normal((1, 2, 4)).astype(np.float32))
        c = VoiceStyle(rng.standard_normal((1, 3, 4)).astype(np.float32),
                       rng.standard_normal((1, 2, 4)).astype(np.float32))
        with pytest.raises(ValueError, match="differ"):
            a.blend(c, 0.5)
