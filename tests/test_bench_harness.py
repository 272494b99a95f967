"""Bench harness contract: throughput rows must carry the MFU fields
(VERDICT r2 item 5 — the claim must be re-checkable from the artifact)."""

import numpy as np

from supertonic_tpu.bench.harness import bench_batch_throughput, bench_single
from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all


def _engine_and_style(cfg):
    params = init_all(0, cfg)
    proc = UnicodeProcessor(build_default_indexer())
    eng = SynthesisEngine(params, cfg, proc, seed=0)
    rng = np.random.default_rng(7)
    style = VoiceStyle(
        rng.standard_normal((1, cfg.ttl.style.n_style,
                             cfg.ttl.style.style_value_dim)).astype(np.float32),
        rng.standard_normal((1, cfg.dp.style.n_style,
                             cfg.dp.style.style_value_dim)).astype(np.float32),
    )
    return eng, style


def test_batch_throughput_reports_mfu_fields(tiny_config):
    eng, style = _engine_and_style(tiny_config)
    tp = bench_batch_throughput(eng, style, "A bench harness sentence.",
                                batch=2, total_step=2, warmup=1, iters=1)
    assert tp["flops_per_batch"] > 0
    assert tp["tflops_effective"] > 0
    assert tp["mfu"] is None  # CPU: peak unknown, None not NaN (valid JSON)
    assert tp["chip"] == "cpu"
    assert set(tp["bucket_shapes"]) == {"b", "l", "t"}
    assert tp["audio_sec_per_sec_per_chip"] > 0
    import json

    json.dumps(tp)  # the whole row must be strict-JSON serializable


def test_bench_single_runs(tiny_config):
    eng, style = _engine_and_style(tiny_config)
    r = bench_single(eng, style, "Short single.", "t", total_step=2,
                     warmup=1, iters=1)
    assert r.rtf > 0 and r.audio_seconds > 0
