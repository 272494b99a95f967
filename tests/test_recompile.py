"""Shape-discipline tests: bucket ladders must bound compile counts
(SURVEY.md §7.2 step 4 — recompile-count tests)."""

import numpy as np
import pytest

from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all


@pytest.fixture()
def engine(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    return SynthesisEngine(params, tiny_config, proc, precision="f32", seed=0)


@pytest.fixture()
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


def test_same_bucket_no_recompile(engine, style):
    """Different texts inside one (B, L, T) bucket must reuse the compiled
    program (equal lengths -> identical bucket choices by construction)."""
    texts = ["Warm up sentence one x.", "Another test phrase ab.",
             "Third try wording etc.."]
    assert len({len(t) for t in texts}) == 1
    # two warm calls: the first runs on the conservative prior bucket, the
    # second on the learned sec/char bucket — stable from then on
    engine.batch([texts[0]], ["en"], style, total_step=2)
    engine.batch([texts[0]], ["en"], style, total_step=2)
    n0 = engine._fused_fn._cache_size()
    for text in texts[1:]:
        engine.batch([text], ["en"], style, total_step=2)
    assert engine._fused_fn._cache_size() == n0


def test_bucket_ladder_bounds_compiles(engine, style, tiny_config):
    """Many varied requests -> compile count bounded by ladder sizes."""
    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta"]
    for i in range(12):
        n = int(rng.integers(1, 30))
        text = " ".join(rng.choice(words, n)) + "."
        engine.batch([text], ["en"], style, total_step=2)
    rt = tiny_config.runtime
    assert engine._fused_fn._cache_size() <= len(rt.text_buckets) * len(
        rt.latent_buckets
    )


def test_batch_bucket_padding(engine, style):
    """Batch sizes pad up the ladder: 3 requests share the B=4 program."""
    engine.batch(["a.", "b.", "c."], ["en"] * 3, style.tile(3), total_step=2)
    engine.batch(["a.", "b.", "c."], ["en"] * 3, style.tile(3), total_step=2)
    n0 = engine._fused_fn._cache_size()
    engine.batch(["d.", "e.", "f.", "g."], ["en"] * 4, style.tile(4),
                 total_step=2)
    assert engine._fused_fn._cache_size() == n0  # same B=4 bucket


def test_text_bucket_invariance(tiny_config, style):
    """The same text padded into DIFFERENT text buckets must synthesize the
    same waveform (identical injected noise): masking makes padding
    semantically inert end-to-end."""
    import dataclasses

    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
    from supertonic_tpu.models import init_all as _init

    params = _init(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    noise = np.random.default_rng(11).standard_normal(
        (1, 64, tiny_config.latent_channels)).astype(np.float32)

    wavs = []
    for ladder in ((64, 128), (96, 192)):
        cfg2 = dataclasses.replace(
            tiny_config,
            runtime=dataclasses.replace(
                tiny_config.runtime, text_buckets=ladder),
        )
        eng = SynthesisEngine(params, cfg2, proc, precision="f32", seed=0)
        w, d = eng.infer_batch(
            ["Bucket invariance probe text."], ["en"], style, 2, 1.05,
            noise=noise,
        )
        wavs.append((w, d))
    (w1, d1), (w2, d2) = wavs
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    np.testing.assert_allclose(w1, w2, atol=3e-5)
