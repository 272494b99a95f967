#!/usr/bin/env python
"""Extract the reference ONNX checkpoints into a supertonic_tpu asset bundle.

Usage:
    python tools/convert_onnx.py --onnx-dir assets/onnx --out assets \
        [--mapping mapping.py] [--list-only]

Works without the `onnx` package (dependency-free protobuf reader,
supertonic_tpu/assets/onnx_reader.py). With --list-only it dumps every
initializer name+shape of each graph — the starting point for writing the
mapping table (assets/convert.MappingRule) once the real Hugging Face assets
are available.
"""

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--onnx-dir", required=True)
    ap.add_argument("--out", default="assets")
    ap.add_argument("--mapping", help="python file defining RULES = {model: [MappingRule...]}")
    ap.add_argument("--list-only", action="store_true")
    ap.add_argument("--lenient", action="store_true",
                    help="fill unmapped params from random-init skeleton")
    args = ap.parse_args()

    from supertonic_tpu.assets.convert import convert, extract_onnx_dir
    from supertonic_tpu.assets.store import save_assets
    from supertonic_tpu.config import TTSConfig, load_tts_json

    full_cfg = os.path.join(args.onnx_dir, "model_config.json")
    cfg_path = os.path.join(args.onnx_dir, "tts.json")
    if os.path.exists(full_cfg):
        # a bundle exported by tools/export_onnx.py carries the full native
        # hparams (tts.json alone cannot reconstruct layer counts/widths)
        from supertonic_tpu.config import _dataclass_from_dict

        with open(full_cfg) as f:
            cfg = _dataclass_from_dict(TTSConfig, json.load(f))
    elif os.path.exists(cfg_path):
        cfg = load_tts_json(cfg_path)
    else:
        cfg = TTSConfig()

    if args.list_only:
        for model, inits in extract_onnx_dir(args.onnx_dir).items():
            print(f"== {model} ({len(inits)} initializers)")
            for name, arr in sorted(inits.items()):
                print(f"  {name:60s} {arr.dtype} {tuple(arr.shape)}")
        return

    params = None
    if args.mapping:
        spec = importlib.util.spec_from_file_location("mapping", args.mapping)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rules = mod.RULES
    else:
        # no hand-written table: try the structural auto-mapper first
        # (assets/automap.py) — it fills the whole tree or raises
        from supertonic_tpu.assets.automap import AutomapError, automap_bundle

        try:
            params, reports = automap_bundle(args.onnx_dir, cfg)
            for model, rep in reports.items():
                print(f"automapped {model}: {rep['matched_params']} params, "
                      f"{rep['consts_checked']} structural consts verified")
        except AutomapError as e:
            print(f"[warn] structural automap failed ({e}); falling back "
                  f"to the MappingRule table (none given -> everything "
                  f"will be unmapped; pass --mapping)")
        rules = {}

    if params is None:
        params, report = convert(args.onnx_dir, cfg, rules,
                                 strict=not args.lenient)
        for model, unmapped in report.items():
            if unmapped:
                print(f"[warn] {model}: {len(unmapped)} unmapped initializers")

    indexer = None
    idx_path = os.path.join(args.onnx_dir, "unicode_indexer.json")
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            import numpy as np

            indexer = np.asarray(json.load(f), np.int64)

    # carry the REAL fetched voice styles into the bundle — without
    # styles=, save_assets substitutes synthetic random presets, and real
    # weights would serve garbage speaker embeddings with no error
    styles = None
    style_dir = os.path.join(args.onnx_dir, "voice_styles")
    if os.path.isdir(style_dir):
        from supertonic_tpu.assets.store import load_voice_style

        styles = {
            os.path.splitext(f)[0]: load_voice_style(
                [os.path.join(style_dir, f)])
            for f in sorted(os.listdir(style_dir)) if f.endswith(".json")
        }
        print(f"carrying {len(styles)} fetched voice styles")
    else:
        print("[warn] no voice_styles/ next to the graphs — writing "
              "synthetic presets (fetch the real ones for real voices)")

    save_assets(args.out, cfg, params, indexer=indexer, styles=styles)
    print(f"asset bundle written to {args.out}")


if __name__ == "__main__":
    main()
