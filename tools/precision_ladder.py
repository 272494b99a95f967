#!/usr/bin/env python
"""Measure the serving precision ladder perceptually (VERDICT r2 item 7).

Synthesizes the same utterances with the SAME injected noise at f32 (parity
reference), bf16 (serving default), int8 (W8A8 estimator matmuls), and
bf16+mu-law egress, then reports MCD / log-mel SNR / waveform SNR vs f32
(utils.audio_metrics). Output: one JSON line per tier + a markdown table on
stderr for docs/PERFORMANCE.md.

Run on the TPU (no --platform flag) for the numbers of record:
    python tools/precision_ladder.py [--total-step 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from supertonic_tpu.utils.jaxenv import setup_compilation_cache  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--total-step", type=int, default=5)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--assets-dir", default=None)
    args = ap.parse_args(argv)
    if args.platform == "cpu" or os.getenv("TTS_PLATFORM") == "cpu":
        from supertonic_tpu.utils.jaxenv import force_cpu

        force_cpu()
    setup_compilation_cache()

    from supertonic_tpu import TTS
    from supertonic_tpu.bench import MID_TEXT, SHORT_TEXT
    from supertonic_tpu.engine import SynthesisEngine
    from supertonic_tpu.utils.audio_metrics import precision_ladder_report
    from supertonic_tpu.utils.mulaw import decode as mulaw_decode

    tts = TTS(args.assets_dir, precision="f32")
    style = tts.get_voice_style("M1")
    cfg = tts.cfg
    texts = [("short", SHORT_TEXT), ("mid", MID_TEXT)]

    params = tts.engine.params
    if args.assets_dir is None:
        # random-init weights: AdaLN-Zero makes every estimator block an
        # exact identity, so the quantized int8 matmuls would never reach
        # the output and the ladder would compare vacuously (the same trap
        # tests/test_int8.py de-zeros). Re-init the gates from a fixed rng
        # for ALL tiers identically.
        from supertonic_tpu.models import layers as L

        hp = cfg.vector_estimator
        ve = dict(params["vector_estimator"])
        ve["adaln_out"] = L.linear_init(np.random.default_rng(7), hp.dim,
                                        2 * hp.dim)
        ve["out_proj"] = L.linear_init(np.random.default_rng(8), hp.dim,
                                       cfg.latent_channels)
        ve["blocks"] = [dict(bp) for bp in ve["blocks"]]
        for i, bp in enumerate(ve["blocks"]):
            din, dout = bp["adaln"]["w"].shape
            bp["adaln"] = L.linear_init(np.random.default_rng(10 + i),
                                        din, dout)
        params = dict(params, vector_estimator=ve)

    tiers = {
        "f32": dict(precision="f32", egress_format="f32"),
        "bf16": dict(precision="bf16", egress_format="f32"),
        "int8": dict(precision="int8", egress_format="f32"),
        "bf16_mulaw8": dict(precision="bf16", egress_format="f32"),
    }
    engines = {}
    for name, kw in tiers.items():
        engines[name] = SynthesisEngine(params, cfg, tts.engine.processor,
                                        seed=0, **kw)
    base = engines["f32"]

    rows = []
    for label, text in texts:
        # one noise tensor shared by every tier (noise-as-input parity
        # design, reference py/helper.py:161-175)
        w0, d0 = base.batch([text], ["en"], style, args.total_step)
        t_lat = w0.shape[1] // cfg.chunk_size
        noise = np.random.default_rng(11).standard_normal(
            (1, t_lat, cfg.latent_channels)).astype(np.float32)

        wavs = {}
        for name, eng in engines.items():
            wav, _ = eng.infer_batch([text], ["en"], style, args.total_step,
                                     1.05, noise=noise)
            wavs[name] = wav[0]
        # mu-law is an EGRESS format: compand/expand the bf16 waveform the
        # way the device egress + host decode would
        from supertonic_tpu.utils.mulaw import encode as mulaw_encode

        wavs["bf16_mulaw8"] = mulaw_decode(mulaw_encode(wavs["bf16_mulaw8"]))

        ref = wavs.pop("f32")
        rep = precision_ladder_report(ref, wavs, cfg.sample_rate,
                                      spec=cfg.ae.spec_processor)
        for tier, m in rep.items():
            row = {"text": label, "tier": tier, "total_step": args.total_step,
                   **{k: round(v, 3) for k, v in m.items()}}
            rows.append(row)
            print(json.dumps(row))

    print("\n| text | tier | MCD (dB) | log-mel SNR (dB) | wav SNR (dB) |",
          file=sys.stderr)
    print("|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['text']} | {r['tier']} | {r['mcd_db']} | "
              f"{r['log_mel_snr_db']} | {r['wav_snr_db']} |", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
