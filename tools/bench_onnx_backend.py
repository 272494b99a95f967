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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--assets-dir", required=True,
                    help="bundle holding the four .onnx graphs + tts.json")
    ap.add_argument("--total-step", type=int, default=5)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--text", default=TEXT)
    args = ap.parse_args(argv)

    from supertonic_tpu.utils.jaxenv import setup_compilation_cache

    if os.getenv("TTS_PLATFORM") == "cpu":  # same env the CLI/server honor
        from supertonic_tpu.utils.jaxenv import force_cpu

        force_cpu()
    setup_compilation_cache()
    from supertonic_tpu import TTS

    os.environ["TTS_ONNX_FUSED"] = "0"
    adapter = measure(TTS(args.assets_dir), n=args.n, steps=args.total_step,
                      text=args.text)
    os.environ["TTS_ONNX_FUSED"] = "1"
    fused = measure(TTS(args.assets_dir), n=args.n, steps=args.total_step,
                    text=args.text)
    speedup = adapter["p50_ms"] / fused["p50_ms"]
    print(json.dumps({"adapter": adapter, "fused": fused,
                      "speedup_p50": round(speedup, 2),
                      "total_step": args.total_step, "n": args.n,
                      # both arms pay the same waveform egress (the adapter
                      # has no device-resident output mode), so this
                      # constant adder UNDERSTATES the pure dispatch-mode
                      # ratio on slow device links
                      "note": "latency includes waveform egress"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
