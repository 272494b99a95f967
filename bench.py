#!/usr/bin/env python
"""Benchmark entry point (run on the real TPU chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Primary metric: audio-seconds synthesized per wall-second per chip at
batch=64, 5 denoising steps (the BASELINE north-star throughput metric).

vs_baseline compares against the strongest published reference number: the
RTX 4090 5-step Mid RTF of 0.004 (reference README.md:252) == 250 audio-sec/s
on the reference's best hardware. vs_baseline = ours / 250 (higher is
better; 1.0 = parity with the reference's best published configuration).

Capture protocol (VERDICT r4 #1 — the artifact must reproduce and explain
the builder's steady-state runs): batch configs are measured with reps
INTERLEAVED round-robin, auto-extended until per-row spread (IQR/median)
is <=2% or 8 reps; every row carries its per-rep raw wall times; link
fingerprints (tunnel RTT, d2h/h2d bandwidth, compile-cache population) are
taken before and after the capture and emitted in the JSON line, so a
capture through a degraded tunnel is identifiable from the artifact alone.
"""

import contextlib
import json
import os
import sys

from supertonic_tpu.utils.jaxenv import setup_compilation_cache

setup_compilation_cache()

REFERENCE_BEST_AUDIO_SEC_PER_SEC = 250.0  # 1 / 0.004 RTF (README.md:252)


def _print_row(tp) -> None:
    print(f"# batch{tp['batch']} {tp['total_step']}-step: "
          f"{tp['audio_sec_per_sec_per_chip']:.1f} "
          f"audio-sec/s/chip ({tp['aggregate_realtime_x']:.0f}x "
          f"realtime, median of {tp['reps']} reps spread "
          f"{tp['spread']*100:.1f}% (minmax {tp['spread_minmax']*100:.1f}%), "
          f"egress {tp['egress_s_per_batch']:.2f}s, "
          f"{tp['tflops_effective']:.1f} TFLOP/s eff"
          + (f", MFU {tp['mfu']*100:.1f}%" if tp["mfu"] is not None
             else "") + ")",
          file=sys.stderr)


def main() -> None:
    from supertonic_tpu import TTS
    from supertonic_tpu.bench import (
        LONG_TEXT,
        MID_TEXT,
        SHORT_TEXT,
        bench_batch_sweep,
        bench_single_matrix,
        link_fingerprint,
    )

    quick = "--quick" in sys.argv
    iters = 2 if quick else 5
    # batch rows dispatch MORE batches per rep than singles: the capture
    # fences only the last batch, so pipeline fill/drain amortizes over the
    # batch count (tools/probe_batch_overhead.py: 60.9 ms steady vs 68.3 ms
    # captured at 5 iters)
    batch_iters = 2 if quick else 24

    tts = TTS()  # random-init fallback exercises the identical compute graph
    engine = tts.engine
    style = tts.get_voice_style("M1")

    fp0 = link_fingerprint()
    print(f"# link: rtt={fp0['rtt_ms']}ms d2h={fp0['d2h_MBps']}MB/s "
          f"h2d={fp0['h2d_MBps']}MB/s cache={fp0['compile_cache_entries']}",
          file=sys.stderr)

    report = {"device": str(__import__("jax").devices()[0]),
              "precision": engine.precision, "singles": [],
              "link_fingerprint_start": fp0}

    cases = (("mid", MID_TEXT),) if quick else (
        ("short", SHORT_TEXT), ("mid", MID_TEXT), ("long", LONG_TEXT))
    step_counts = (5,) if quick else (2, 5)

    if quick:
        arms = [("", engine)]
    else:
        # latency-serving configuration: 8-bit mu-law egress halves the
        # device->host bytes (G.711, ~13-bit speech quality, decoded on the
        # host). Same compute graph; shares the device-resident params.
        # Measured INTERLEAVED with the int16 arm so tunnel drift over the
        # window hits both arms equally (VERDICT r3 weak #3).
        from supertonic_tpu.engine import SynthesisEngine

        mulaw_engine = SynthesisEngine(
            engine.params, tts.cfg, engine.processor,
            precision=engine.precision, egress_format="mulaw",
        )
        arms = [("", engine), ("_mulaw8", mulaw_engine)]

    sr = tts.cfg.sample_rate
    for r in bench_single_matrix(arms, style, cases, step_counts,
                                 iters=iters, max_iters=2 if quick else 9):
        row = r.as_dict()
        # the LINK floor this capture's tunnel state allows for the row:
        # one round-trip + payload bytes at the probed d2h bandwidth
        # (mu-law = 1 byte/sample, int16 = 2). Device compute for a single
        # utterance is ~3-10 ms (docs/PERFORMANCE.md) — a captured median
        # near this floor is link-bound, not compute-bound.
        bps = 1 if row["name"].endswith("_mulaw8") else 2
        row["link_floor_ms"] = round(
            fp0["rtt_ms"]
            + r.audio_seconds * sr * bps / (fp0["d2h_MBps"] * (1 << 20))
            * 1e3, 1)
        report["singles"].append(row)
        print(
            f"# {row['name']}: rtf={r.rtf:.4f} "
            f"chars/s={r.chars_per_sec:.0f} "
            f"synth={r.synth_seconds*1e3:.1f}ms "
            f"(min {r.synth_seconds_min*1e3:.1f}, link floor "
            f"{row['link_floor_ms']:.0f}) "
            f"audio={r.audio_seconds:.2f}s",
            file=sys.stderr,
        )

    batch_cases = ((64, 5),) if quick else ((32, 5), (64, 5), (64, 2))
    # TTS_TRACE_DIR=/path captures a jax.profiler device trace (xplane)
    # of the batch sweep for TensorBoard/XProf analysis
    trace_dir = os.getenv("TTS_TRACE_DIR")
    if trace_dir:
        from supertonic_tpu.utils.timing import device_trace
        trace_ctx = device_trace(trace_dir)
    else:
        trace_ctx = contextlib.nullcontext()
    with trace_ctx:
        rows = bench_batch_sweep(
            engine, style, MID_TEXT, batch_cases, iters=batch_iters,
            depth=3, min_reps=1 if quick else 3, max_reps=1 if quick else 8,
            target_spread=0.02,
        )
    best = None
    for tp in rows:
        report[f"batch{tp['batch']}_{tp['total_step']}step"] = tp
        _print_row(tp)
        # primary metric stays the default operating point (5 steps)
        if tp["total_step"] == 5 and (
            best is None
            or tp["audio_sec_per_sec_per_chip"]
            > best["audio_sec_per_sec_per_chip"]
        ):
            best = tp
    tp = best

    fp1 = link_fingerprint()
    report["link_fingerprint_end"] = fp1
    print(f"# link end: rtt={fp1['rtt_ms']}ms d2h={fp1['d2h_MBps']}MB/s",
          file=sys.stderr)

    with open("bench_report.json", "w") as f:
        json.dump(report, f, indent=2)

    value = tp["audio_sec_per_sec_per_chip"]
    print(json.dumps({
        "metric": f"audio_sec_per_sec_per_chip_b{tp['batch']}_5step",
        "value": round(value, 2),
        "unit": "audio-seconds/sec/chip",
        "vs_baseline": round(value / REFERENCE_BEST_AUDIO_SEC_PER_SEC, 3),
        "mfu": tp["mfu"],
        "tflops_effective": tp["tflops_effective"],
        "reps": tp["reps"],
        "spread": tp["spread"],
        "spread_minmax": tp["spread_minmax"],
        "rep_batch_seconds": tp["rep_batch_seconds"],
        "pipeline_depth": tp["pipeline_depth"],
        "link_rtt_ms": [fp0["rtt_ms"], fp1["rtt_ms"]],
        "link_d2h_MBps": [fp0["d2h_MBps"], fp1["d2h_MBps"]],
        "long_2step_rtf": next(
            (round(s["rtf"], 5) for s in report["singles"]
             if s["name"] == "long_2step"), None),
        "long_2step_rtf_min": next(
            (round(s["synth_seconds_min"] / s["audio_seconds"], 5)
             for s in report["singles"] if s["name"] == "long_2step"), None),
        "long_2step_link_floor_rtf": next(
            (round(s["link_floor_ms"] / 1e3 / s["audio_seconds"], 5)
             for s in report["singles"] if s["name"] == "long_2step"), None),
        "b64_2step": (report.get("batch64_2step") or {}).get(
            "audio_sec_per_sec_per_chip"),
        "b64_2step_spread": (report.get("batch64_2step") or {}).get("spread"),
        "b64_2step_reps": (report.get("batch64_2step") or {}).get(
            "rep_batch_seconds"),
    }))


if __name__ == "__main__":
    main()
