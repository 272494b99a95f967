"""HTTP service — API-compatible with the reference FastAPI service
(reference py/service.py):

    GET  /health                  -> {"status": "ok"}
    POST /tts                     -> single: WAV stream; batch: ZIP of WAVs
    GET  /metrics                 -> JSON throughput/latency counters (ours)

Request schema and validation bounds match the reference exactly
(total_step in [1, 50], speed > 0, silence >= 0 — py/service.py:34-39).
Styles are resolved through the asset store (preset name or path) and cached
per-process (the reference re-parses the style JSON on every request,
py/service.py:95 — a known inefficiency we do not reproduce).
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import List, Union

import numpy as np

from ..config import AVAILABLE_LANGS
from ..utils import sanitize_filename, wav_bytes


def _env_flag(name: str, default: str = "0") -> bool:
    return os.getenv(name, default).strip().lower() in {"1", "true", "yes", "y", "on"}


def create_app(tts=None):
    """Build the FastAPI app. ``tts`` defaults to a TTS() constructed from
    env config (TTS_ASSETS_DIR, TTS_PRECISION)."""
    from fastapi import FastAPI, HTTPException
    from fastapi.responses import JSONResponse, StreamingResponse
    from pydantic import BaseModel, Field

    if tts is None:
        from .. import TTS

        tts = TTS(
            os.getenv("TTS_ASSETS_DIR") or None,
            precision=os.getenv("TTS_PRECISION") or None,
        )

    app = FastAPI(title="Supertonic-TPU TTS Service")
    style_cache: dict[str, object] = {}

    class TTSRequest(BaseModel):
        text: Union[str, List[str]] = Field(..., description="Text to synthesize.")
        lang: Union[str, List[str]] = Field("en", description="Language(s).")
        voice_style: Union[str, List[str]] = Field("M1", description="Preset name(s) or style path(s).")
        total_step: int = Field(5, ge=1, le=50)
        speed: float = Field(1.05, gt=0.0)
        batch: bool = False
        silence_duration: float = Field(0.3, ge=0.0)
        crossfade_duration: float = Field(0.0, ge=0.0)

    def _ensure_list(v):
        return v if isinstance(v, list) else [v]

    def _get_style(name: str):
        if name not in style_cache:
            try:
                style_cache[name] = tts.assets.get_voice_style(name)
            except FileNotFoundError as e:
                raise HTTPException(status_code=400, detail=str(e))
        return style_cache[name]

    @app.get("/health")
    def health():
        return JSONResponse({"status": "ok"})

    @app.get("/metrics")
    def metrics():
        return JSONResponse(tts.engine.profiler.summary())

    @app.post("/tts")
    def synthesize(req: TTSRequest):
        texts = _ensure_list(req.text)
        langs = _ensure_list(req.lang)
        styles = _ensure_list(req.voice_style)

        if req.batch:
            if not (len(texts) == len(langs) == len(styles)):
                raise HTTPException(
                    status_code=400,
                    detail="text, lang, and voice_style must have the same length.",
                )
        elif len(texts) != 1 or len(langs) != 1 or len(styles) != 1:
            raise HTTPException(
                status_code=400,
                detail="Non-batch mode requires single text, lang, and voice_style.",
            )

        invalid = sorted({l for l in langs if l not in AVAILABLE_LANGS})
        if invalid:
            raise HTTPException(
                status_code=400,
                detail=f"Invalid language(s): {', '.join(invalid)}",
            )

        sr = tts.sample_rate
        if req.batch:
            from ..engine.engine import VoiceStyle

            sts = [_get_style(s) for s in styles]
            style = VoiceStyle(
                np.concatenate([s.ttl for s in sts]),
                np.concatenate([s.dp for s in sts]),
            )
            wav, dur = tts.engine.batch(texts, langs, style, req.total_step, req.speed)
        else:
            wav, dur = tts.engine(
                texts[0], langs[0], _get_style(styles[0]),
                req.total_step, req.speed, req.silence_duration,
                req.crossfade_duration,
            )

        chunks = tts.engine.trim(wav, dur)

        if len(chunks) == 1:
            fname = sanitize_filename(texts[0], 40) or "tts"
            return StreamingResponse(
                io.BytesIO(wav_bytes(chunks[0], sr)),
                media_type="audio/wav",
                headers={"Content-Disposition": f'attachment; filename="{fname}.wav"'},
            )

        zbuf = io.BytesIO()
        with zipfile.ZipFile(zbuf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
            for i, chunk in enumerate(chunks):
                fname = sanitize_filename(texts[i], 40) or f"tts_{i + 1}"
                zf.writestr(f"{fname}.wav", wav_bytes(chunk, sr))
        zbuf.seek(0)
        return StreamingResponse(
            zbuf,
            media_type="application/zip",
            headers={"Content-Disposition": 'attachment; filename="tts_outputs.zip"'},
        )

    return app


def main():
    import uvicorn

    uvicorn.run(
        create_app(),
        host=os.getenv("TTS_HOST", "0.0.0.0"),
        port=int(os.getenv("TTS_PORT", "8000")),
    )


if __name__ == "__main__":
    main()
