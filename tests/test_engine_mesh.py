"""Engine on an 8-device mesh must match single-device output exactly."""

import numpy as np
import pytest

from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all
from supertonic_tpu.parallel import make_mesh
from supertonic_tpu.parallel.multihost import host_shard


def _pin_rate(*engines, rate=1.0 / 11.0):
    """Exact-match tests need BOTH engines to pick the same latent bucket:
    the learned sec/char prior is persisted across engines (engine.py
    _load_rate_cache), so engine 2 would otherwise see the rate engine 1
    just saved, land in a different bucket, and draw a different noise
    grid (same duration, different waveform)."""
    for e in engines:
        e._pin_rate(rate)


def _style(cfg, n=1, seed=7):
    rng = np.random.default_rng(seed)
    return VoiceStyle(
        rng.standard_normal(
            (n, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
        ).astype(np.float32),
        rng.standard_normal(
            (n, cfg.dp.style.n_style, cfg.dp.style.style_value_dim)
        ).astype(np.float32),
    )


def test_mesh_engine_matches_single_device(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    texts = [f"Utterance number {i} for the mesh test." for i in range(8)]
    langs = ["en"] * 8
    style = _style(tiny_config, 8)

    single = SynthesisEngine(params, tiny_config, proc, precision="f32",
                             seed=3, egress_format="f32")
    mesh = make_mesh(8)
    sharded = SynthesisEngine(params, tiny_config, proc, precision="f32",
                              seed=3, egress_format="f32", mesh=mesh)
    _pin_rate(single, sharded)
    w1, d1 = single.batch(texts, langs, style, total_step=2)
    w2, d2 = sharded.batch(texts, langs, style, total_step=2)

    np.testing.assert_allclose(d1, d2, atol=1e-6)
    np.testing.assert_allclose(w1, w2, atol=3e-5)


def test_mesh_engine_with_tensor_parallel(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    texts = ["Tensor parallel check one.", "Tensor parallel check two."]
    style = _style(tiny_config, 2)

    single = SynthesisEngine(params, tiny_config, proc, precision="f32",
                             seed=5, egress_format="f32")
    mesh = make_mesh(8, model_parallel=4)
    tp = SynthesisEngine(params, tiny_config, proc, precision="f32",
                         seed=5, egress_format="f32", mesh=mesh)
    _pin_rate(single, tp)
    w1, d1 = single.batch(texts, ["en", "en"], style, total_step=2)
    w2, d2 = tp.batch(texts, ["en", "en"], style, total_step=2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)
    np.testing.assert_allclose(w1, w2, atol=5e-5)


def test_host_shard_partition():
    items = list(range(10))
    shards = [host_shard(items, pid, 3) for pid in range(3)]
    assert sorted(sum(shards, [])) == items
    assert max(len(s) for s in shards) - min(len(s) for s in shards) <= 1


def test_batcher_over_mesh(tiny_config):
    """Continuous batcher driving a mesh-sharded engine (the pod-serving
    configuration: DP over local devices + request coalescing)."""
    from supertonic_tpu.parallel.batcher import ContinuousBatcher

    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    engine = SynthesisEngine(params, tiny_config, proc, precision="f32",
                             mesh=make_mesh(8))
    batcher = ContinuousBatcher(engine, max_batch=8, max_wait_ms=5)
    try:
        futs = [
            batcher.submit(f"Mesh batcher request {i}.", "en",
                           _style(tiny_config, 1, seed=i), total_step=2)
            for i in range(12)
        ]
        for f in futs:
            wav, dur = f.result(timeout=300)
            assert wav.ndim == 1 and dur > 0
            assert np.isfinite(wav).all()
        assert batcher.stats["batches"] < 12
    finally:
        batcher.shutdown()
