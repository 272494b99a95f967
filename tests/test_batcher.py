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


def test_batcher_matches_direct_engine(engine, tiny_config):
    """Batched synthesis must equal a direct engine call on the same text —
    including expansion-heavy text ("e.g.," -> "for example, "), which
    catches any double-normalization of the pre-normalized dispatch path
    (lang tags would wrap twice and shift every token)."""
    text = "Use abbreviations, e.g., this one & that @ home."
    style = _style(tiny_config)
    batcher = ContinuousBatcher(engine, max_batch=4, max_wait_ms=20.0)
    try:
        wav_b, dur_b = batcher.submit(text, "en", style,
                                      total_step=2).result(timeout=300)
    finally:
        batcher.shutdown()
    wav_d, dur_d = engine.infer_batch([text], ["en"], style, total_step=2)
    # duration is a pure function of the token ids (no noise): equality
    # proves the pre-normalized dispatch fed the same ids. (Waveforms
    # differ — each dispatch draws fresh PRNG noise by design.)
    assert float(dur_b) == pytest.approx(float(dur_d[0]), abs=1e-5)
    assert len(wav_b) == len(engine.trim(wav_d, dur_d)[0])

    # and at the unit level: tokenizing the pre-normalized text must equal
    # tokenizing the raw text through the full pipeline
    from supertonic_tpu.frontend import preprocess_text

    ids_raw, mask_raw = engine.processor([text], ["en"])
    ids_pre, mask_pre = engine.processor(
        [preprocess_text(text, "en")], ["en"], pre_normalized=True)
    np.testing.assert_array_equal(ids_raw, ids_pre)
    np.testing.assert_array_equal(mask_raw, mask_pre)


def test_mismatched_style_shape_fails_alone(engine, tiny_config):
    """A request with wrong style dims must fail ITS future only, not the
    co-batched valid requests."""
    good = _style(tiny_config)
    bad = VoiceStyle(good.ttl[:, :, :-1], good.dp)  # wrong style_value_dim
    batcher = ContinuousBatcher(engine, max_batch=8, max_wait_ms=150.0)
    try:
        f_good = [batcher.submit(f"Valid request {i}.", "en", good,
                                 total_step=2) for i in range(3)]
        f_bad = batcher.submit("Valid request X.", "en", bad, total_step=2)
        for f in f_good:
            wav, dur = f.result(timeout=300)
            assert dur > 0 and len(wav) > 0
        with pytest.raises(Exception):
            f_bad.result(timeout=300)
    finally:
        batcher.shutdown()


def test_speed_zero_rejected(engine, tiny_config):
    with pytest.raises(ValueError, match="speed"):
        engine.infer_batch(["Hi."], ["en"], _style(tiny_config), 2, 0.0)


def test_warmup_does_not_pollute_learned_rate(engine, tiny_config,
                                              monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    style = _style(tiny_config)
    # one real observation first (this one legitimately writes the cache)
    engine.infer_batch(["A real sentence for the rate learner."], ["en"],
                       style, total_step=2)
    window_before = {k: list(w) for k, w in engine._spc_windows.items()}
    cache_before = {p: p.read_text() for p in tmp_path.glob("stpu_rate*")}
    engine.warmup(batch_sizes=(1,), text_buckets=(32,), total_steps=(2,))
    window_after = {k: list(w) for k, w in engine._spc_windows.items()}
    assert window_after == window_before  # no synthetic rows
    cache_after = {p: p.read_text() for p in tmp_path.glob("stpu_rate*")}
    assert cache_after == cache_before  # warmup never writes the rate cache
    # empty tuples warm NOTHING (not the default lattice)
    assert engine.warmup(batch_sizes=(), total_steps=(2,)) == 0


def test_rate_prior_ratchets_and_self_heals(engine, tiny_config,
                                            monkeypatch, tmp_path):
    """The persisted per-bucket rate prior ratchets UP on new highs, and
    writes DOWN once a full window of real observations sits well below a
    poisoned prior (one outlier must not inflate the bucket forever)."""
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
    style = _style(tiny_config)
    text = "A steady sentence for the rate learner to observe."

    engine.infer_batch([text], ["en"], style, total_step=2)
    lb = next(iter(engine._spc_windows))
    obs = max(engine._spc_window_for(lb))
    assert engine._spc_priors[lb] >= obs  # ratcheted up from the first obs

    # poison the prior far above reality (simulates a one-off outlier that
    # got persisted) and feed a full window of normal observations
    engine._spc_priors[lb] = obs * 4.0
    engine._spc_counts[lb] = 0
    engine._spc_windows.pop(lb)
    for _ in range(engine._spc_window_for(lb).maxlen):
        engine.infer_batch([text], ["en"], style, total_step=2)
    healed = engine._spc_priors[lb]
    assert healed < obs * 1.5, f"prior did not heal: {healed} vs obs {obs}"
    # and the healed value persisted
    assert engine._load_rate_cache()[lb] == healed
