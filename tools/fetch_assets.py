#!/usr/bin/env python
"""Fetch the SupertonicTTS-2 assets from Hugging Face (CLI).

    python tools/fetch_assets.py --out assets/onnx
    python tools/convert_onnx.py --onnx-dir assets/onnx --out assets

Thin wrapper over supertonic_tpu.assets.fetch (resumable, checksummed,
actionable offline error).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from supertonic_tpu.assets.fetch import (  # noqa: E402
    BASE_URL, CHUNK, FILES, REPO, FetchError, download_file, fetch_all)

__all__ = ["BASE_URL", "CHUNK", "FILES", "REPO", "FetchError",
           "download_file", "fetch_all"]

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/onnx",
                    help="destination directory (graphs + configs; "
                         "voice_styles/ subdir)")
    ap.add_argument("--repo", default=REPO)
    ap.add_argument("--manifest",
                    help="optional JSON {repo_path: sha256} to verify against")
    args = ap.parse_args()

    manifest = None
    if args.manifest:
        with open(args.manifest) as f:
            manifest = json.load(f)

    try:
        digests = fetch_all(args.out, repo=args.repo, manifest=manifest)
    except FetchError as e:
        print(f"error: {e}", file=sys.stderr)
        sys.exit(1)
    print(f"fetched {len(digests)} file(s) into {args.out}")
    print("next: python tools/convert_onnx.py "
          f"--onnx-dir {args.out} --out assets")


if __name__ == "__main__":
    main()
