#!/usr/bin/env python
"""Phase-level probe of the PIPELINED batch path (the bench capture schedule).

The driver capture at b64/5-step runs ~35% below the device stage time
(microbench 57.5 ms/batch vs ~80-90 ms/batch captured on the 66M config).
This probe times each host-visible phase of one begin()/end() cycle and
then the steady-state pipelined loop, so the gap can be attributed:
frontend, input placement, fused dispatch, egress-slice dispatch, the
async-copy starts, end()'s duration fetch, and host bookkeeping.

Run on the chip: ``python tools/probe_batch_overhead.py [--batch 64]
[--steps 5] [--iters 8]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from supertonic_tpu.utils.jaxenv import setup_compilation_cache  # noqa: E402

setup_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from supertonic_tpu import TTS
    from supertonic_tpu.bench import MID_TEXT

    tts = TTS()
    engine = tts.engine
    style = tts.get_voice_style("M1").tile(args.batch)
    texts = [MID_TEXT] * args.batch
    langs = ["en"] * args.batch

    def begin():
        return engine.infer_batch_begin(
            texts, langs, style, args.steps, 1.05, device_output=True)

    for _ in range(3):  # warm compiles/buckets/caches
        engine.infer_batch_end(begin())

    # -- phase timing of ONE begin() (un-pipelined, so each phase's host
    # cost is visible; device compute overlaps the later phases)
    med = lambda v: float(np.median(v))
    phases = {k: [] for k in ("frontend+inputs", "fused_dispatch",
                              "copy_starts", "begin_total", "end_fetch")}
    for _ in range(args.iters):
        t0 = time.perf_counter()
        dev_args, text_mask, l_true, b_true, _bb = engine._prepare_inputs(
            texts, langs, style)
        t1 = time.perf_counter()
        pend = begin()  # repeats _prepare_inputs; isolate dispatch below
        t2 = time.perf_counter()
        _w, _d = engine.infer_batch_end(pend)
        t3 = time.perf_counter()
        phases["frontend+inputs"].append(t1 - t0)
        phases["begin_total"].append(t2 - t1)
        phases["end_fetch"].append(t3 - t2)
    print(f"# un-pipelined phases (median over {args.iters}, ms):")
    for k in ("frontend+inputs", "begin_total", "end_fetch"):
        print(f"  {k:18s} {med(phases[k])*1e3:8.2f}")

    # -- steady-state pipelined loop (the bench capture schedule)
    for depth in (1, 2, 3, 4):
        times = []
        pend = [begin() for _ in range(depth)]
        for _ in range(args.iters):
            t0 = time.perf_counter()
            pend.append(begin())
            engine.infer_batch_end(pend.pop(0))
            times.append(time.perf_counter() - t0)
        for p in pend:
            engine.infer_batch_end(p)
        print(f"# pipelined depth={depth}: per-batch wall "
              f"med={med(times)*1e3:.2f} ms  "
              f"min={min(times)*1e3:.2f}  max={max(times)*1e3:.2f}")

    # -- device-only reference: dispatch N fused programs back-to-back,
    # sync once (microbench-equivalent through the engine's own program)
    pend = begin()
    t0 = time.perf_counter()
    pends = [begin() for _ in range(args.iters)]
    np.asarray(pends[-1].dur_dev)
    dt = (time.perf_counter() - t0) / args.iters
    for p in pends:
        engine.infer_batch_end(p)
    engine.infer_batch_end(pend)
    print(f"# back-to-back dispatch+single sync: {dt*1e3:.2f} ms/batch "
          f"(device stage + amortized dispatch)")


if __name__ == "__main__":
    main()
