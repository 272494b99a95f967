#!/usr/bin/env python
"""Concurrency soak for the HTTP service: hammer every endpoint from many
threads for a fixed duration and assert nothing breaks.

Covers the full wire surface concurrently — /tts (single + batch ZIP),
/tts/stream (chunked), /voices, /metrics, /health, malformed bodies (422),
oversized bodies (413) — against a live server. Exit 0 iff every response
matches its expected status and every WAV/ZIP parses.

    TTS_PLATFORM=cpu TTS_PORT=8940 TTS_ASSETS_DIR=... \
        python -m supertonic_tpu.serve.http_server &
    python tools/soak_http.py --base http://127.0.0.1:8940 --seconds 120
"""

from __future__ import annotations

import argparse
import collections
import concurrent.futures
import io
import json
import random
import sys
import threading
import time
import zipfile

import httpx


def _check_wav(content: bytes) -> bool:
    return len(content) > 44 and content[:4] == b"RIFF"


def make_ops(base: str):
    def single(c: httpx.Client, rng: random.Random):
        r = c.post(f"{base}/tts",
                   json={"text": f"Soak sentence {rng.randrange(99)}.",
                         "total_step": rng.choice([2, 5])}, timeout=300)
        assert r.status_code == 200, r.text
        assert _check_wav(r.content)

    def batch_zip(c: httpx.Client, rng: random.Random):
        n = rng.choice([2, 3])
        r = c.post(f"{base}/tts",
                   json={"text": [f"Row {i}." for i in range(n)],
                         "lang": ["en"] * n, "voice_style": ["M1"] * n,
                         "batch": True, "total_step": 2}, timeout=300)
        assert r.status_code == 200, r.text
        z = zipfile.ZipFile(io.BytesIO(r.content))
        assert len(z.namelist()) == n

    def stream(c: httpx.Client, rng: random.Random):
        got = 0
        with c.stream("POST", f"{base}/tts/stream",
                      json={"text": "A streaming soak sentence. " * 4,
                            "total_step": 2}, timeout=300) as r:
            assert r.status_code == 200
            for chunk in r.iter_bytes():
                got += len(chunk)
        assert got > 44

    def voices(c: httpx.Client, rng: random.Random):
        r = c.get(f"{base}/voices", timeout=60)
        assert r.status_code == 200 and r.json()["voices"]

    def metrics(c: httpx.Client, rng: random.Random):
        r = c.get(f"{base}/metrics", timeout=60)
        assert r.status_code == 200 and "requests" in r.json()

    def bad_schema(c: httpx.Client, rng: random.Random):
        r = c.post(f"{base}/tts", json={"text": "x", "total_step": 99},
                   timeout=60)
        assert r.status_code == 422, r.status_code

    def bad_lang(c: httpx.Client, rng: random.Random):
        r = c.post(f"{base}/tts", json={"text": "x", "lang": "de"},
                   timeout=60)
        assert r.status_code == 400, r.status_code

    def oversized(c: httpx.Client, rng: random.Random):
        big = b'{"text": "' + b"a" * (9 * 1024 * 1024) + b'"}'
        try:
            r = c.post(f"{base}/tts", content=big,
                       headers={"content-type": "application/json"},
                       timeout=60)
            assert r.status_code == 413, r.status_code
        except httpx.RequestError:
            pass  # RST after bounded drain is acceptable for abusive sizes

    def openai_speech(c: httpx.Client, rng: random.Random):
        r = c.post(f"{base}/v1/audio/speech",
                   json={"input": f"Compat soak {rng.randrange(99)}.",
                         "voice": rng.choice(["alloy", "M2", "onyx"]),
                         "total_step": 2}, timeout=300)
        assert r.status_code == 200, r.text
        assert _check_wav(r.content)

    # weighted mix: mostly synthesis, steady control-plane checks
    return ([single] * 5 + [batch_zip] * 2 + [stream] * 2 + [openai_speech]
            + [voices, metrics, bad_schema, bad_lang, oversized])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base", default="http://127.0.0.1:8940")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args(argv)

    ops = make_ops(args.base)
    deadline = time.time() + args.seconds
    counts: collections.Counter = collections.Counter()
    errors: list[str] = []
    lock = threading.Lock()

    def worker(wid: int):
        rng = random.Random(wid)
        with httpx.Client() as c:
            while time.time() < deadline and not errors:
                op = rng.choice(ops)
                try:
                    op(c, rng)
                    with lock:
                        counts[op.__name__] += 1
                except Exception as e:  # noqa: BLE001 — ANY op failure is
                    # exactly what the soak exists to report (corrupt ZIP,
                    # invalid JSON, short reads — not just assertion text);
                    # an escaping exception would kill the worker and dump
                    # a traceback instead of the structured JSON report
                    with lock:
                        errors.append(f"{op.__name__}: {type(e).__name__} {e}")

    with concurrent.futures.ThreadPoolExecutor(args.threads) as pool:
        list(pool.map(worker, range(args.threads)))

    ok = not errors
    print(json.dumps({"ok": ok, "ops": dict(counts),
                      "total": sum(counts.values()),
                      "errors": errors[:5]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
