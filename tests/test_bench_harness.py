"""Bench harness contract tests.

Throughput rows must carry the MFU fields (VERDICT r2 item 5) AND the
capture-repeatability protocol fields (VERDICT r4 #1/#7): per-rep raw wall
times, IQR and min-max spread, pipeline depth, batches per rep — so the
scoreboard format can't silently drift from what the ROUND docs quote.
"""

import json

import numpy as np

from supertonic_tpu.bench.harness import (
    bench_batch_sweep,
    bench_batch_throughput,
    bench_single,
    bench_single_ab,
    bench_single_matrix,
    link_fingerprint,
)
from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all

# the full protocol (quoted by ROUND docs / read by the driver) must carry
# these keys per batch row — keep in sync with bench.py's final JSON line
PROTOCOL_ROW_KEYS = {
    "batch", "total_step", "audio_seconds_per_batch", "synth_seconds",
    "reps", "spread", "spread_minmax", "rep_batch_seconds", "pipeline_depth",
    "batches_per_rep", "egress_s_per_batch", "audio_sec_per_sec",
    "audio_sec_per_sec_per_chip", "audio_sec_per_sec_e2e",
    "aggregate_realtime_x", "flops_per_batch", "tflops_effective", "mfu",
    "chip", "bucket_shapes",
}


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


def test_batch_throughput_reports_protocol_fields(tiny_config):
    eng, style = _engine_and_style(tiny_config)
    tp = bench_batch_throughput(eng, style, "A bench harness sentence.",
                                batch=2, total_step=2, warmup=1, iters=2,
                                reps=2, depth=2)
    assert PROTOCOL_ROW_KEYS <= set(tp)
    assert tp["flops_per_batch"] > 0
    assert tp["tflops_effective"] > 0
    assert tp["mfu"] is None  # CPU: peak unknown, None not NaN (valid JSON)
    assert tp["chip"] == "cpu"
    assert set(tp["bucket_shapes"]) == {"b", "l", "t"}
    assert tp["audio_sec_per_sec_per_chip"] > 0
    # per-rep raws: the artifact itself must let a reader recompute any
    # spread statistic (VERDICT r4 weak #2)
    assert len(tp["rep_batch_seconds"]) == tp["reps"] == 2
    assert all(x > 0 for x in tp["rep_batch_seconds"])
    assert tp["pipeline_depth"] == 2 and tp["batches_per_rep"] == 2
    assert 0 <= tp["spread"] <= tp["spread_minmax"]
    json.dumps(tp)  # the whole row must be strict-JSON serializable


def test_batch_sweep_interleaves_and_extends(tiny_config):
    eng, style = _engine_and_style(tiny_config)
    order = []
    rows = bench_batch_sweep(
        eng, style, "A bench harness sentence.", ((2, 2), (2, 1)),
        warmup=1, iters=2, depth=2, min_reps=2, max_reps=3,
        target_spread=0.0,  # force the extension branch deterministically
        on_progress=lambda c: order.append((c.batch, c.total_step,
                                            len(c.rep_times))),
    )
    assert [r["total_step"] for r in rows] == [2, 1]
    # round-robin: both configs complete rep k before either starts rep k+1
    assert order[:4] == [(2, 2, 1), (2, 1, 1), (2, 2, 2), (2, 1, 2)]
    # target_spread=0 forced one extension round (capped at max_reps=3)
    assert all(r["reps"] == 3 for r in rows)
    for r in rows:
        assert PROTOCOL_ROW_KEYS <= set(r)
        assert len(r["rep_batch_seconds"]) == r["reps"]


def test_link_fingerprint_schema():
    fp = link_fingerprint(rtt_reps=2, bw_mb=0.25)
    assert {"rtt_ms", "rtt_ms_raw", "d2h_MBps", "h2d_MBps",
            "compile_cache_entries", "device", "unix_time"} <= set(fp)
    assert fp["rtt_ms"] >= 0 and fp["d2h_MBps"] > 0 and fp["h2d_MBps"] > 0
    json.dumps(fp)


def test_bench_single_runs(tiny_config):
    eng, style = _engine_and_style(tiny_config)
    r = bench_single(eng, style, "Short single.", "t", total_step=2,
                     warmup=1, iters=1)
    assert r.rtf > 0 and r.audio_seconds > 0


def test_bench_single_matrix_round_robin(tiny_config):
    """Global singles interleave: every row gets one timed call per round,
    and rows out of spread get extension rounds (VERDICT r4 #1)."""
    eng, style = _engine_and_style(tiny_config)
    rows = bench_single_matrix(
        [("", eng)], style, [("a", "Row one text."), ("b", "Row two here.")],
        (2,), warmup=1, iters=2, max_iters=3, target_spread=0.0,
    )
    assert [r.name for r in rows] == ["a_2step", "b_2step"]
    for r in rows:
        # target_spread=0 forces exactly one extension round
        assert len(r.times) == 3
        assert r.synth_seconds > 0 and r.rtf > 0
        json.dumps(r.as_dict())


def test_bench_single_ab_carries_raw_times(tiny_config):
    eng, style = _engine_and_style(tiny_config)
    rows = bench_single_ab([("", eng)], style, "Short single.", "t",
                           total_step=2, warmup=1, iters=3)
    (r,) = rows
    d = r.as_dict()
    assert len(d["times"]) == 3 and all(x > 0 for x in d["times"])
    # times are rounded for the artifact; min must match to that precision
    assert abs(d["synth_seconds_min"] - min(d["times"])) < 1e-4
    json.dumps(d)
