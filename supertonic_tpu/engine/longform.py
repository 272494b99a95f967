"""Long-form orchestration shared by every engine backend.

Chunk → batched synthesis → stitch/stream/trim over the ``infer_batch``
primitive (reference TextToSpeech.__call__, py/helper.py:217-254). Both the
native ``SynthesisEngine`` and the ONNX per-call adapter
(engine/onnx_adapter.OnnxEngineAdapter) mix this in — one implementation,
so a fix to chunk grouping, stitch parameters, or trim semantics cannot
drift between the two live serving paths.

Requirements on the host class: ``infer_batch(texts, langs, style,
total_step, speed) -> (wav [B, T], dur [B])`` and ``self.cfg.sample_rate``.
"""

from __future__ import annotations

import numpy as np

from ..frontend import chunk_text, max_len_for_lang
from . import stitch


class LongFormSynthesis:
    def __call__(
        self,
        text: str,
        lang: str,
        style,
        total_step: int = 5,
        speed: float = 1.05,
        silence_duration: float = 0.3,
        crossfade_duration: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Single-utterance long-form synthesis: chunk, synthesize all chunks
        as one batch, stitch. Returns (wav [1, T] np, duration [1] np) like
        the reference __call__ (py/helper.py:217-244)."""
        assert style.batch == 1, (
            "Single speaker text to speech only supports single style"
        )
        chunks = chunk_text(text, max_len=max_len_for_lang(lang))
        if not chunks:
            return np.zeros((1, 0), np.float32), np.zeros((1,), np.float32)
        n = len(chunks)
        wavs, durs = self.infer_batch(
            chunks, [lang] * n, style.tile(n), total_step, speed
        )
        joined, total = stitch.stitch(
            [wavs[i] for i in range(n)],
            [float(durs[i]) for i in range(n)],
            self.cfg.sample_rate,
            silence_duration=silence_duration,
            crossfade_duration=crossfade_duration,
        )
        return joined[None, :], np.array([total], np.float32)

    def batch(
        self,
        text_list: list[str],
        lang_list: list[str],
        style,
        total_step: int = 5,
        speed: float = 1.05,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.infer_batch(text_list, lang_list, style, total_step, speed)

    def stream(
        self,
        text: str,
        lang: str,
        style,
        total_step: int = 5,
        speed: float = 1.05,
        group_size: int = 2,
    ):
        """Long-form streaming: yields (trimmed wav [T] f32, duration s) per
        chunk as soon as it is synthesized — playback can start after chunk
        one (time-to-first-audio) while later groups synthesize. The FIRST
        group is always a single chunk (minimum time-to-first-audio); later
        chunks batch up to ``group_size`` to keep the MXU fed."""
        assert style.batch == 1
        chunks = chunk_text(text, max_len=max_len_for_lang(lang))
        i = 0
        while i < len(chunks):
            n = 1 if i == 0 else group_size
            group = chunks[i : i + n]
            i += len(group)
            wavs, durs = self.infer_batch(
                group, [lang] * len(group), style.tile(len(group)),
                total_step, speed,
            )
            for w, d in zip(self.trim(wavs, durs), durs):
                yield w, float(d)

    def stream_windows(
        self,
        text: str,
        lang: str,
        style,
        total_step: int = 5,
        speed: float = 1.05,
        group_size: int = 2,
        window_frames: int = 64,
    ):
        """Like :meth:`stream`, but the FIRST chunk's audio leaves in
        vocoder WINDOWS — first samples are on the host after one window's
        vocode+transfer instead of the whole chunk's (BASELINE TTFA).
        Yields ``(wav [T] f32, seconds, chunk_end bool)``; pieces with
        ``chunk_end=False`` are continuations of the same chunk (no silence
        gap belongs between them). Interior samples are bit-identical to
        full-chunk synthesis (halo >= the vocoder's receptive field —
        models/vocoder.receptive_field_frames; equality-tested)."""
        assert style.batch == 1
        chunks = chunk_text(text, max_len=max_len_for_lang(lang))
        if not chunks:
            return
        windows_ok = (window_frames and getattr(self, "backend", None) is None
                      and getattr(self, "mesh", None) is None
                      and hasattr(self, "_vocode_stream"))
        if windows_ok:
            yield from self._vocode_stream(chunks[0], lang, style,
                                           total_step, speed, window_frames)
        else:
            wavs, durs = self.infer_batch([chunks[0]], [lang], style,
                                          total_step, speed)
            yield self.trim(wavs, durs)[0], float(durs[0]), True
        i = 1
        while i < len(chunks):
            group = chunks[i: i + group_size]
            i += len(group)
            wavs, durs = self.infer_batch(
                group, [lang] * len(group), style.tile(len(group)),
                total_step, speed)
            for w, d in zip(self.trim(wavs, durs), durs):
                yield w, float(d), True

    # convenience: reference example trims at save time (py/example_onnx.py:113)
    def trim(self, wav: np.ndarray, duration: np.ndarray) -> list[np.ndarray]:
        sr = self.cfg.sample_rate
        return [
            wav[b, : int(sr * float(np.atleast_1d(duration)[b]))]
            for b in range(wav.shape[0])
        ]
