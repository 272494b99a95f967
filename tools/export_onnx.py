#!/usr/bin/env python
"""Export a native asset bundle to the reference ONNX format.

The reference's distributable artifact is a directory of four ONNX graphs
plus tts.json / unicode_indexer.json (reference py/helper.py:289-319);
this tool produces that directory from our native params so a model served
by this framework can be consumed by any of the reference's eleven ports.

    python tools/export_onnx.py --out /tmp/exported [--assets-dir BUNDLE]
                                [--anonymize]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--assets-dir", default=None,
                    help="native bundle (params.npz); random-init when absent")
    ap.add_argument("--anonymize", action="store_true",
                    help="opaque initializer names instead of param paths")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from supertonic_tpu.utils.jaxenv import force_cpu

    force_cpu()  # pure host-side serialization; never claim the TPU
    from supertonic_tpu.assets.onnx_export import export_bundle
    from supertonic_tpu.assets.store import load_assets

    assets = load_assets(args.assets_dir, seed=args.seed)
    if assets.params is None:
        from supertonic_tpu.models import init_all

        assets.params = init_all(args.seed, assets.cfg)
    export_bundle(assets.params, assets.cfg, args.out,
                  indexer=assets.processor.indexer,
                  anonymize=args.anonymize)
    print(json.dumps({"out": args.out,
                      "graphs": sorted(os.listdir(args.out))}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
