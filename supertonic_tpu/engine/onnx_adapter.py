"""Serving adapter: the ONNX graph-executor backend behind the engine API.

When a fetched asset bundle holds the four REAL reference graphs but no
converted ``params.npz`` yet, ``TTS()`` serves THROUGH the generic JAX ONNX
executor (assets/onnx_pipeline) instead of silently falling back to
random-init native models. This adapter exposes the subset of the
SynthesisEngine surface the serving stack uses — ``__call__`` / ``batch`` /
``stream`` / ``infer_batch`` (+ begin/end for the continuous batcher) /
``trim`` / ``to_host`` / ``profiler`` — so the CLI, the HTTP service, the
batcher, and the router all work over real graphs day-one, with zero
architecture knowledge and no weight-mapping step (reference call-site
contract per SURVEY.md §2.2, py/helper.py:140-254).

The executor path runs each graph as its own jitted program (3 + total_step
dispatches per batch, like the reference's ORT calls) — slower than the
fused native engine, but bit-faithful to the graphs. Convert with
tools/convert_onnx.py to graduate to the fused path.
"""

from __future__ import annotations

import time

import numpy as np

from ..config import TTSConfig
from ..utils.timing import StageProfiler
from .longform import LongFormSynthesis


class OnnxEngineAdapter(LongFormSynthesis):
    """SynthesisEngine-shaped facade over assets.OnnxPipeline."""

    def __init__(self, pipeline, cfg: TTSConfig):
        self.pipeline = pipeline
        self.cfg = cfg
        self.precision = "f32"  # executor runs reference-strict f32 matmuls
        self.profiler = StageProfiler()

    # ------------------------------------------------------------- core
    def infer_batch(
        self,
        text_list: list[str],
        lang_list: list[str],
        style,
        total_step: int = 5,
        speed: float = 1.05,
        noise: np.ndarray | None = None,
        device_output: bool = False,
        pre_normalized: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        if not text_list:
            return (np.zeros((0, 0), np.float32), np.zeros((0,), np.float32))
        t0 = time.perf_counter()
        with self.profiler.stage("onnx_pipeline"):
            if noise is not None:
                wav, dur = self.pipeline._infer(
                    text_list, lang_list, style, total_step, speed,
                    noise=noise)
            else:
                wav, dur = self.pipeline._infer(
                    text_list, lang_list, style, total_step, speed,
                    pre_normalized=pre_normalized)
        wav = np.asarray(wav)
        dur = np.asarray(dur, np.float32)
        audio_s = float(np.sum(dur))
        n_chars = sum(len(t) for t in text_list)
        record = (self.profiler.record_throughput if device_output
                  else self.profiler.record_result)
        record(audio_s, n_chars, time.perf_counter() - t0)
        return wav, dur

    # the batcher's begin/end pipelining protocol: the executor backend has
    # no split dispatch (each graph is its own synchronous program), so
    # begin computes eagerly and end unwraps
    def infer_batch_begin(self, text_list, lang_list, style,
                          total_step: int = 5, speed: float = 1.05, *,
                          device_output: bool = False,
                          pre_normalized: bool = False):
        return self.infer_batch(text_list, lang_list, style, total_step,
                                speed, device_output=device_output,
                                pre_normalized=pre_normalized)

    def infer_batch_end(self, pending):
        return pending

    # ------------------------------------------------- reference API shape
    # __call__ / batch / stream / trim come from LongFormSynthesis (shared
    # with SynthesisEngine — no drift between the two live serving paths)

    def infer_with_progress(self, text, lang, style, total_step: int = 5,
                            speed: float = 1.05, progress_callback=None):
        """Single-utterance synthesis with a per-denoise-step callback
        (reference web port behavior) — the executor pipeline runs its Euler
        loop step-at-a-time on the host anyway, so this costs nothing."""
        assert style.batch == 1
        return self.pipeline._infer(
            [text], [lang], style, total_step, speed,
            progress_callback=progress_callback)

    def warmup(self, *, total_steps=(2, 5), progress=None, **_kw) -> int:
        """Pre-compile the executor programs for the smallest bucket."""
        style = self._default_style()
        n = 0
        for steps in total_steps:
            self.infer_batch(["Warm up."], ["en"], style, total_step=steps,
                             device_output=True)
            n += 1
            if progress:
                progress(n, len(total_steps))
        return n

    def _default_style(self):
        from .engine import VoiceStyle

        rng = np.random.default_rng(0)
        s_ttl, s_dp = self.cfg.ttl.style, self.cfg.dp.style
        return VoiceStyle(
            rng.standard_normal(
                (1, s_ttl.n_style, s_ttl.style_value_dim)).astype(np.float32),
            rng.standard_normal(
                (1, s_dp.n_style, s_dp.style_value_dim)).astype(np.float32),
        )

    # ------------------------------------------------------------ helpers
    def to_host(self, wav) -> np.ndarray:
        return np.asarray(wav)
