#!/usr/bin/env python
"""A/B the two ONNX-graph serving modes on the current accelerator.

Measures host-fetched single-utterance latency over the SAME graph bundle:

  * adapter  (TTS_ONNX_FUSED=0): one dispatch per graph call — the
    reference's 3 + total_step ORT-call cost shape,
  * fused    (default): all four graphs in one XLA program
    (assets/onnx_backend.py).

This is the methodology behind docs/PERFORMANCE.md's "fused vs per-call"
table (9.2x on a v5e behind a ~35 ms tunnel); run it against the REAL
fetched assets (tools/fetch_assets.py) to get the day-one serving numbers
on your hardware:

    python tools/bench_onnx_backend.py --assets-dir ~/.cache/supertonic_tpu/assets
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TEXT = ("The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill nearby, purring.")


def _style_for(tts):
    try:
        return tts.get_voice_style("M1")
    except (FileNotFoundError, ValueError):
        import numpy as np

        from supertonic_tpu.engine import VoiceStyle

        rng = np.random.default_rng(4)
        s_ttl, s_dp = tts.cfg.ttl.style, tts.cfg.dp.style
        return VoiceStyle(
            rng.standard_normal(
                (1, s_ttl.n_style, s_ttl.style_value_dim)).astype(np.float32),
            rng.standard_normal(
                (1, s_dp.n_style, s_dp.style_value_dim)).astype(np.float32))


def measure(tts, *, n: int, steps: int, text: str) -> dict:
    style = _style_for(tts)
    for _ in range(2):  # warm compiles
        tts.synthesize(text, style, total_step=steps)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        wav, _dur = tts.synthesize(text, style, total_step=steps)
        assert np.isfinite(np.asarray(wav)).all()
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return {"p50_ms": float(np.median(ts) * 1e3),
            "p90_ms": float(np.percentile(ts, 90) * 1e3),
            "min_ms": float(ts.min() * 1e3)}


def measure_batch(engine, style, *, batch: int, steps: int, text: str,
                  iters: int = 3) -> dict | None:
    """Device-resident b-batch throughput (same schedule as bench.py) —
    only engines with the begin/end pipeline support it (fused + native);
    the per-call adapter's cost shape has no device-resident output mode."""
    if not hasattr(engine, "infer_batch_begin"):
        return None
    from supertonic_tpu.bench.harness import bench_batch_throughput

    tp = bench_batch_throughput(engine, style, text, batch=batch,
                                total_step=steps, warmup=2, iters=iters)
    return {"audio_sec_per_sec_per_chip": round(
                tp["audio_sec_per_sec_per_chip"], 1),
            "synth_s": round(tp["synth_seconds"], 4),
            "mfu": tp["mfu"]}


def native_tts(assets_dir: str, steps_cfg=None):
    """Automap the bundle's graphs onto the native architecture and wrap the
    tuned native engine behind the same TTS API — the third arm of the
    comparison (only possible when the graphs structurally match;
    assets/automap.py raises otherwise)."""
    import json as _json

    from supertonic_tpu import TTS
    from supertonic_tpu.assets.automap import automap_bundle
    from supertonic_tpu.config import TTSConfig, _dataclass_from_dict
    from supertonic_tpu.engine import SynthesisEngine

    full_cfg = os.path.join(assets_dir, "model_config.json")
    if os.path.exists(full_cfg):
        with open(full_cfg) as f:
            cfg = _dataclass_from_dict(TTSConfig, _json.load(f))
    else:
        from supertonic_tpu.config import load_tts_json

        cfg = load_tts_json(os.path.join(assets_dir, "tts.json"))
    params, _ = automap_bundle(assets_dir, cfg)
    tts = TTS(assets_dir)  # for styles/processor; engine replaced below
    tts.engine = SynthesisEngine(params, cfg, tts.assets.processor)
    tts.cfg = cfg
    return tts


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--assets-dir", required=True,
                    help="bundle holding the four .onnx graphs + tts.json")
    ap.add_argument("--total-step", type=int, default=5)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--text", default=TEXT)
    ap.add_argument("--batch", type=int, default=0,
                    help="also report device-resident batch throughput at "
                         "this batch size (fused + native arms)")
    ap.add_argument("--native", action="store_true",
                    help="add a third arm: the bundle auto-mapped onto the "
                         "tuned native engine (assets/automap.py)")
    ap.add_argument("--bf16", action="store_true",
                    help="add a fused-executor arm with bf16 activation "
                         "storage (TTS_ONNX_BF16, assets/onnx_exec.py)")
    ap.add_argument("--skip-adapter", action="store_true")
    args = ap.parse_args(argv)

    from supertonic_tpu.utils.jaxenv import setup_compilation_cache

    if os.getenv("TTS_PLATFORM") == "cpu":  # same env the CLI/server honor
        from supertonic_tpu.utils.jaxenv import force_cpu

        force_cpu()
    setup_compilation_cache()
    from supertonic_tpu import TTS

    # arm isolation: a pre-exported TTS_ONNX_BF16=1 would silently make the
    # baseline fused arm bf16 too (A/B delta ~0); env edits are process-local
    os.environ.pop("TTS_ONNX_BF16", None)
    out: dict = {"total_step": args.total_step, "n": args.n,
                 # all arms pay the same waveform egress (the adapter has
                 # no device-resident output mode), so singles latency
                 # UNDERSTATES dispatch-mode ratios on slow device links
                 "note": "singles latency includes waveform egress"}
    if not args.skip_adapter:
        os.environ["TTS_ONNX_FUSED"] = "0"
        out["adapter"] = measure(TTS(args.assets_dir), n=args.n,
                                 steps=args.total_step, text=args.text)
    os.environ["TTS_ONNX_FUSED"] = "1"
    fused_tts = TTS(args.assets_dir)
    out["fused"] = measure(fused_tts, n=args.n, steps=args.total_step,
                           text=args.text)
    if args.batch:
        out["fused"]["batch"] = measure_batch(
            fused_tts.engine, _style_for(fused_tts), batch=args.batch,
            steps=args.total_step, text=args.text)
    del fused_tts
    if args.bf16:
        os.environ["TTS_ONNX_BF16"] = "1"
        b16 = TTS(args.assets_dir)
        out["fused_bf16"] = measure(b16, n=args.n, steps=args.total_step,
                                    text=args.text)
        if args.batch:
            out["fused_bf16"]["batch"] = measure_batch(
                b16.engine, _style_for(b16), batch=args.batch,
                steps=args.total_step, text=args.text)
        del b16
        os.environ.pop("TTS_ONNX_BF16", None)
    if args.native:
        nat = native_tts(args.assets_dir)
        out["native"] = measure(nat, n=args.n, steps=args.total_step,
                                text=args.text)
        if args.batch:
            out["native"]["batch"] = measure_batch(
                nat.engine, _style_for(nat), batch=args.batch,
                steps=args.total_step, text=args.text)
        out["fused_vs_native_p50"] = round(
            out["fused"]["p50_ms"] / out["native"]["p50_ms"], 2)
        if args.batch and out["native"].get("batch"):
            out["fused_vs_native_throughput"] = round(
                out["fused"]["batch"]["audio_sec_per_sec_per_chip"]
                / out["native"]["batch"]["audio_sec_per_sec_per_chip"], 3)
            # INTERLEAVED re-measure: the arm-after-arm numbers above span
            # different tunnel-health windows (minutes apart after each
            # arm's compiles); alternating reps hits both arms with the
            # same drift, so the RATIO is trustworthy (same rationale as
            # bench_single_ab, VERDICT r3 weak #3)
            from supertonic_tpu.bench.harness import bench_batch_throughput

            fused2 = TTS(args.assets_dir)
            arms = {"fused": (fused2.engine, _style_for(fused2)),
                    "native": (nat.engine, _style_for(nat))}
            per = {k: [] for k in arms}
            for _rep in range(3):
                for k, (eng, st) in arms.items():
                    tp = bench_batch_throughput(
                        eng, st, args.text, batch=args.batch,
                        total_step=args.total_step, warmup=0 if per[k]
                        else 2, iters=8, reps=1)
                    per[k].append(tp["audio_sec_per_sec_per_chip"])
            import numpy as _np

            il = {k: round(float(_np.median(v)), 1) for k, v in per.items()}
            out["interleaved_b%d" % args.batch] = il
            out["fused_vs_native_throughput_interleaved"] = round(
                il["fused"] / il["native"], 3)
            del fused2
    if "adapter" in out:
        out["speedup_p50"] = round(
            out["adapter"]["p50_ms"] / out["fused"]["p50_ms"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
