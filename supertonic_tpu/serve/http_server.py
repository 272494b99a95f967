"""Zero-dependency HTTP service (stdlib http.server).

Same wire contract as the reference FastAPI service (py/service.py) and as
our optional FastAPI app (app.py — used when fastapi is installed):

    GET  /health      -> 200 {"status": "ok"}
    GET  /metrics     -> 200 JSON profiler counters
    POST /tts         -> single: audio/wav stream; batch: application/zip
                         400 on validation errors {"detail": ...}
                         422 on schema/bounds errors (pydantic-compatible)
    POST /tts/stream  -> chunked-transfer WAV: audio begins flowing after the
                         FIRST text chunk synthesizes (long-form
                         time-to-first-audio; ours — no reference analog)

Threaded server: requests serialize around the engine lock (XLA dispatch is
already async; a single engine saturates one chip — run one process per
chip, shard requests at the load balancer for pod-slice serving).
"""

from __future__ import annotations

import io
import json
import threading
import time
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..config import AVAILABLE_LANGS
from ..utils import sanitize_filename, wav_bytes
from ..utils.logging import default_logger as log


class ValidationError(Exception):
    def __init__(self, status: int, detail: str):
        self.status = status
        self.detail = detail


def _ensure_list(v):
    return v if isinstance(v, list) else [v]


def _parse_request(body: dict) -> dict:
    if "text" not in body:
        raise ValidationError(422, "field 'text' is required")
    req = {
        "text": body["text"],
        "lang": body.get("lang", "en"),
        "voice_style": body.get("voice_style", "M1"),
        "total_step": body.get("total_step", 5),
        "speed": body.get("speed", 1.05),
        "batch": bool(body.get("batch", False)),
        "silence_duration": body.get("silence_duration", 0.3),
        "crossfade_duration": body.get("crossfade_duration", 0.0),
    }
    ts = req["total_step"]
    if not isinstance(ts, int) or not (1 <= ts <= 50):
        raise ValidationError(422, "total_step must be an int in [1, 50]")
    if not (isinstance(req["speed"], (int, float)) and req["speed"] > 0):
        raise ValidationError(422, "speed must be > 0")
    if req["silence_duration"] < 0 or req["crossfade_duration"] < 0:
        raise ValidationError(422, "durations must be >= 0")
    return req


class TTSService:
    """Transport-independent request handling (shared by the stdlib server
    and the FastAPI app)."""

    def __init__(self, tts):
        self.tts = tts
        self._style_cache: dict[str, object] = {}
        self._lock = threading.Lock()

    def get_style(self, name: str):
        if name not in self._style_cache:
            try:
                self._style_cache[name] = self.tts.assets.get_voice_style(name)
            except FileNotFoundError as e:
                raise ValidationError(400, str(e))
        return self._style_cache[name]

    def synthesize(self, req: dict) -> tuple[bytes, str, str]:
        """Returns (payload, content_type, filename)."""
        texts = _ensure_list(req["text"])
        langs = _ensure_list(req["lang"])
        styles = _ensure_list(req["voice_style"])

        if req["batch"]:
            if not (len(texts) == len(langs) == len(styles)):
                raise ValidationError(
                    400, "text, lang, and voice_style must have the same length."
                )
        elif len(texts) != 1 or len(langs) != 1 or len(styles) != 1:
            raise ValidationError(
                400, "Non-batch mode requires single text, lang, and voice_style."
            )

        invalid = sorted({l for l in langs if l not in AVAILABLE_LANGS})
        if invalid:
            raise ValidationError(400, f"Invalid language(s): {', '.join(invalid)}")

        engine = self.tts.engine
        sr = self.tts.sample_rate
        with self._lock:
            if req["batch"]:
                from ..engine.engine import VoiceStyle

                sts = [self.get_style(s) for s in styles]
                style = VoiceStyle(
                    np.concatenate([s.ttl for s in sts]),
                    np.concatenate([s.dp for s in sts]),
                )
                wav, dur = engine.batch(
                    texts, langs, style, req["total_step"], req["speed"]
                )
            else:
                wav, dur = engine(
                    texts[0], langs[0], self.get_style(styles[0]),
                    req["total_step"], req["speed"], req["silence_duration"],
                    req["crossfade_duration"],
                )
        chunks = engine.trim(wav, dur)

        if len(chunks) == 1:
            fname = sanitize_filename(texts[0], 40) or "tts"
            return wav_bytes(chunks[0], sr), "audio/wav", f"{fname}.wav"

        zbuf = io.BytesIO()
        with zipfile.ZipFile(zbuf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            for i, chunk in enumerate(chunks):
                fname = sanitize_filename(texts[i], 40) or f"tts_{i + 1}"
                zf.writestr(f"{fname}.wav", wav_bytes(chunk, sr))
        return zbuf.getvalue(), "application/zip", "tts_outputs.zip"


def make_server(tts, host: str = "0.0.0.0", port: int = 8000) -> ThreadingHTTPServer:
    service = TTSService(tts)

    class Handler(BaseHTTPRequestHandler):
        def _send_json(self, status: int, obj: dict):
            payload = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/health":
                self._send_json(200, {"status": "ok"})
            elif self.path == "/metrics":
                self._send_json(200, service.tts.engine.profiler.summary())
            else:
                self._send_json(404, {"detail": "not found"})

        def _write_chunk(self, data: bytes):
            self.wfile.write(f"{len(data):X}\r\n".encode())
            self.wfile.write(data)
            self.wfile.write(b"\r\n")

        def _stream_tts(self, req: dict):
            """Chunked WAV: header with streaming sentinel sizes, then PCM16
            per synthesized text chunk."""
            import struct

            texts = _ensure_list(req["text"])
            langs = _ensure_list(req["lang"])
            styles = _ensure_list(req["voice_style"])
            if len(texts) != 1 or len(langs) != 1 or len(styles) != 1:
                raise ValidationError(
                    400, "Streaming requires single text, lang, and voice_style."
                )
            if langs[0] not in AVAILABLE_LANGS:
                raise ValidationError(400, f"Invalid language(s): {langs[0]}")
            style = service.get_style(styles[0])
            sr = service.tts.sample_rate

            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            # streaming WAV header: 0xFFFFFFFF sizes (unknown length)
            header = (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVE"
                      + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr,
                                              sr * 2, 2, 16)
                      + b"data" + struct.pack("<I", 0xFFFFFFFF))
            self._write_chunk(header)
            gap = np.zeros(int(req["silence_duration"] * sr), np.float32)
            with service._lock:
                first = True
                for wav, _dur in service.tts.engine.stream(
                    texts[0], langs[0], style, req["total_step"], req["speed"]
                ):
                    if not first and len(gap):
                        self._write_chunk(
                            (gap * 32767).astype("<i2").tobytes()
                        )
                    first = False
                    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2")
                    self._write_chunk(pcm.tobytes())
            self.wfile.write(b"0\r\n\r\n")

        def do_POST(self):
            if self.path not in ("/tts", "/tts/stream"):
                self._send_json(404, {"detail": "not found"})
                return
            t0 = time.perf_counter()
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or b"{}")
                req = _parse_request(body)
                if self.path == "/tts/stream":
                    self._stream_tts(req)
                    log.info("tts_stream", latency_s=round(
                        time.perf_counter() - t0, 4))
                    return
                payload, ctype, fname = service.synthesize(req)
            except ValidationError as e:
                log.warning("tts_rejected", status=e.status, detail=e.detail)
                self._send_json(e.status, {"detail": e.detail})
                return
            except json.JSONDecodeError:
                self._send_json(422, {"detail": "invalid JSON body"})
                return
            log.info(
                "tts", batch=bool(req["batch"]),
                total_step=req["total_step"], bytes=len(payload),
                latency_s=round(time.perf_counter() - t0, 4),
            )
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.send_header(
                "Content-Disposition", f'attachment; filename="{fname}"'
            )
            self.end_headers()
            self.wfile.write(payload)

    return ThreadingHTTPServer((host, port), Handler)


def main():
    import os

    if os.getenv("TTS_PLATFORM") == "cpu":
        from ..utils.jaxenv import force_cpu

        force_cpu()

    from .. import TTS

    tts = TTS(
        os.getenv("TTS_ASSETS_DIR") or None,
        precision=os.getenv("TTS_PRECISION") or None,
    )
    host = os.getenv("TTS_HOST", "0.0.0.0")
    port = int(os.getenv("TTS_PORT", "8000"))
    server = make_server(tts, host, port)
    print(f"Serving Supertonic-TPU TTS on {host}:{port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
