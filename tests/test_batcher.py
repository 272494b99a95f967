"""Continuous batcher tests."""

import threading
import time

import numpy as np
import pytest

from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all
from supertonic_tpu.parallel.batcher import ContinuousBatcher


@pytest.fixture()
def engine(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    return SynthesisEngine(params, tiny_config, proc, precision="f32", seed=0)


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


def test_requests_are_batched(engine, tiny_config):
    batcher = ContinuousBatcher(engine, max_batch=8, max_wait_ms=150.0)
    style = _style(tiny_config)
    try:
        futures = [
            batcher.submit(f"Concurrent request number {i}.", "en", style,
                           total_step=2)
            for i in range(6)
        ]
        results = [f.result(timeout=300) for f in futures]
        for wav, dur in results:
            assert dur > 0
            assert len(wav) == int(tiny_config.sample_rate * dur)
        # 6 same-bucket requests arriving together -> far fewer batches
        assert batcher.stats["batches"] < 6
        assert batcher.stats["batched_requests"] == 6
    finally:
        batcher.shutdown()


def test_mixed_styles_and_langs(engine, tiny_config):
    batcher = ContinuousBatcher(engine, max_batch=8, max_wait_ms=100.0)
    try:
        futs = [
            batcher.submit("Hello there.", "en", _style(tiny_config, 1), 2),
            batcher.submit("Bonjour le monde.", "fr", _style(tiny_config, 2), 2),
            batcher.submit("Hola mundo.", "es", _style(tiny_config, 3), 2),
        ]
        for f in futs:
            wav, dur = f.result(timeout=300)
            assert dur > 0
    finally:
        batcher.shutdown()


def test_different_steps_split_groups(engine, tiny_config):
    batcher = ContinuousBatcher(engine, max_batch=8, max_wait_ms=100.0)
    style = _style(tiny_config)
    try:
        f1 = batcher.submit("Steps two.", "en", style, total_step=2)
        f2 = batcher.submit("Steps three.", "en", style, total_step=3)
        assert f1.result(timeout=300)[1] > 0
        assert f2.result(timeout=300)[1] > 0
        assert batcher.stats["batches"] == 2
    finally:
        batcher.shutdown()


def test_shutdown_rejects_new_work(engine, tiny_config):
    batcher = ContinuousBatcher(engine, max_batch=4, max_wait_ms=10.0)
    batcher.shutdown()
    with pytest.raises(RuntimeError):
        batcher.submit("Late.", "en", _style(tiny_config))


def test_soak_concurrent_mixed_requests(engine, tiny_config):
    """Race-safety soak (SURVEY.md §5 sanitizer row): many concurrent
    submitters with mixed langs/styles/steps; every future must resolve."""
    import concurrent.futures

    batcher = ContinuousBatcher(engine, max_batch=8, max_wait_ms=20.0)
    langs = ["en", "ko", "es", "pt", "fr"]
    try:
        def submit(i):
            style = _style(tiny_config, seed=i % 5)
            return batcher.submit(
                f"Soak request {i} with some words.", langs[i % 5], style,
                total_step=2 + (i % 2),
            )

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            futures = list(pool.map(submit, range(40)))
        results = [f.result(timeout=600) for f in futures]
        assert len(results) == 40
        for wav, dur in results:
            assert dur > 0 and len(wav) > 0
        assert batcher.stats["batched_requests"] == 40
        assert batcher.stats["batches"] < 40  # real coalescing happened
    finally:
        batcher.shutdown()


class TestFaultInjection:
    """SURVEY.md §5 failure-handling row: an engine failure mid-batch must
    fail exactly that batch's futures with the real exception and leave the
    batcher serving — not deadlock waiters or kill the dispatch thread."""

    def test_dispatch_failure_fails_futures_then_recovers(
            self, engine, tiny_config):
        real_begin = engine.infer_batch_begin
        boom = {"armed": True}

        def flaky_begin(*a, **kw):
            if boom.pop("armed", False):
                raise RuntimeError("injected dispatch failure")
            return real_begin(*a, **kw)

        engine.infer_batch_begin = flaky_begin
        batcher = ContinuousBatcher(engine, max_batch=4, max_wait_ms=10.0)
        style = _style(tiny_config)
        try:
            f = batcher.submit("Doomed request.", "en", style, total_step=2)
            with pytest.raises(RuntimeError, match="injected dispatch"):
                f.result(timeout=300)
            # batcher thread survived: the next request succeeds
            f2 = batcher.submit("Recovered request.", "en", style,
                                total_step=2)
            wav, dur = f2.result(timeout=300)
            assert dur > 0 and np.isfinite(wav).all()
        finally:
            batcher.shutdown()

    def test_resolve_failure_fails_futures_then_recovers(
            self, engine, tiny_config):
        real_end = engine.infer_batch_end
        boom = {"armed": True}

        def flaky_end(pending):
            if boom.pop("armed", False):
                raise RuntimeError("injected resolve failure")
            return real_end(pending)

        engine.infer_batch_end = flaky_end
        batcher = ContinuousBatcher(engine, max_batch=4, max_wait_ms=10.0)
        style = _style(tiny_config)
        try:
            f = batcher.submit("Doomed at resolve.", "en", style,
                               total_step=2)
            with pytest.raises(RuntimeError, match="injected resolve"):
                f.result(timeout=300)
            f2 = batcher.submit("Still serving.", "en", style, total_step=2)
            wav, dur = f2.result(timeout=300)
            assert dur > 0
        finally:
            batcher.shutdown()
