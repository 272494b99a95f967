"""supertonic_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the
Supertonic TTS inference stack.

Top-level convenience API mirrors the reference's PyPI package surface
(reference py/example_pypi.py:1-16):

    from supertonic_tpu import TTS
    tts = TTS()                      # assets dir optional; random-init fallback
    style = tts.get_voice_style("M4")
    wav, duration = tts.synthesize("Hello world!", voice_style=style)
    tts.save_audio(wav, "out.wav")
"""

from __future__ import annotations

import numpy as np

from .config import AVAILABLE_LANGS, TTSConfig, VOICE_PRESETS
from .engine import SynthesisEngine, VoiceStyle

__version__ = "0.1.0"


class TTS:
    """High-level synthesizer (reference pypi-API shape, py/example_pypi.py)."""

    def __init__(
        self,
        assets_dir: str | None = None,
        *,
        precision: str | None = None,
        seed: int = 0,
        auto_download: bool = False,
        egress_format: str = "int16",
    ):
        from .assets import load_assets

        if auto_download:
            # reference py/example_pypi.py:3-4: TTS(auto_download=True)
            # pulls Supertone/supertonic-2 (~260 MB) from Hugging Face.
            assets_dir = self._auto_download(assets_dir)
        import os

        graphs_dir = self._find_graphs(assets_dir)
        if graphs_dir is not None and graphs_dir != assets_dir and \
                os.path.exists(os.path.join(graphs_dir, "tts.json")):
            # un-flattened bundle (assets/onnx/*): cfg + indexer live next to
            # the graphs
            assets_dir = graphs_dir
        self.assets = load_assets(assets_dir, seed=seed,
                                  init_params=graphs_dir is None)
        self.cfg = self.assets.cfg
        self.engine = None
        if graphs_dir is not None:
            # the bundle holds the four REAL reference graphs but no
            # converted params.npz: serve THROUGH the generic ONNX graph
            # executor rather than silently substituting random-init native
            # weights. Default is the FUSED executor backend — the four
            # graphs composed into single XLA programs under the full
            # SynthesisEngine (buckets, learned rate, pipelined dispatch);
            # TTS_ONNX_FUSED=0 selects the reference-orchestration adapter
            # (one dispatch per graph call, per-step host loop) instead.
            # Run tools/convert_onnx.py to graduate to the native engine.
            from .utils.logging import default_logger as log

            fused = os.environ.get("TTS_ONNX_FUSED", "1") != "0"
            backend = pipeline = None
            try:
                if fused:
                    from .assets import load_onnx_backend

                    mp = ("float32" if (precision or self.cfg.runtime.precision)
                          == "f32" else "default")
                    backend = load_onnx_backend(graphs_dir, self.cfg,
                                                matmul_precision=mp)
                    try:
                        # abstract trace (no compile): graphs that can't
                        # compose into the fused programs — e.g. an
                        # estimator whose output shape breaks the
                        # fori_loop invariant — surface HERE, and serving
                        # degrades to the per-call adapter instead of
                        # 500ing the first live request
                        backend.validate()
                    except Exception as e:
                        log.warning(
                            "onnx_fused_backend_untraceable",
                            dir=graphs_dir,
                            error=f"{type(e).__name__}: {e}",
                            fallback="per-call adapter")
                        backend = None
                        fused = False
                if not fused or backend is None:
                    from .assets import load_onnx_pipeline

                    mp = ("float32" if (precision or
                                        self.cfg.runtime.precision) == "f32"
                          else "default")
                    pipeline = load_onnx_pipeline(graphs_dir, seed=seed,
                                                  bucketed=True,
                                                  matmul_precision=mp)
                    if egress_format != "int16":
                        # the adapter always fetches f32 host audio (its
                        # per-call cost shape has no device egress quantize)
                        log.warning("onnx_adapter_ignores_egress_format",
                                    requested=egress_format)
            except (OSError, ValueError, KeyError) as e:
                from .assets.onnx_backend import ContractMismatch

                if isinstance(e, ContractMismatch):
                    # structurally-wrong graphs: serving random-init native
                    # weights instead would hide a real model bug — fail
                    raise
                # unreadable/corrupt graphs (e.g. an interrupted fetch):
                # fall back to the native engine rather than failing startup
                log.warning("onnx_backend_unloadable", dir=graphs_dir,
                            error=f"{type(e).__name__}: {e}")
            if backend is not None:
                self.engine = SynthesisEngine(
                    backend.params, self.cfg, self.assets.processor,
                    precision=precision, seed=seed,
                    egress_format=egress_format, backend=backend,
                )
                log.info("serving_onnx_fused_backend", dir=graphs_dir)
            elif pipeline is not None:
                from .engine.onnx_adapter import OnnxEngineAdapter

                self.engine = OnnxEngineAdapter(pipeline, self.cfg)
                log.info("serving_onnx_executor_backend", dir=graphs_dir)
        if self.engine is None:
            if self.assets.params is None:  # graph load failed above
                from .models import init_all

                self.assets.params = init_all(seed, self.cfg)
            self.engine = SynthesisEngine(
                self.assets.params, self.cfg, self.assets.processor,
                precision=precision, seed=seed, egress_format=egress_format,
            )

    @staticmethod
    def _find_graphs(assets_dir: str | None) -> str | None:
        """Directory holding the four reference graphs, when the bundle has
        them but no converted params.npz (fetched-but-unconverted assets)."""
        import os

        if not assets_dir:
            return None
        if os.path.exists(os.path.join(assets_dir, "params.npz")):
            return None
        graph_names = ("duration_predictor", "text_encoder",
                       "vector_estimator", "vocoder")
        for sub in ("", "onnx"):
            d = os.path.join(assets_dir, sub) if sub else assets_dir
            if all(os.path.exists(os.path.join(d, f"{g}.onnx"))
                   for g in graph_names):
                return d
        return None

    @staticmethod
    def _auto_download(assets_dir: str | None) -> str:
        """Fetch the HF asset repo into a local cache dir (resumable,
        idempotent; clear actionable error when the environment has no
        egress). The fetched bundle supplies the real tts.json config,
        unicode indexer, and voice styles immediately; native-model weights
        additionally need `tools/convert_onnx.py` (params.npz), or use
        `assets.load_onnx_pipeline` to run the fetched graphs directly."""
        import os

        target = assets_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "supertonic_tpu", "assets")
        if os.path.exists(os.path.join(target, "params.npz")):
            return target  # already converted — nothing to fetch
        # fetch_all is idempotent (skips complete files, resumes .part), so
        # a partially-fetched dir — e.g. tts.json downloaded, the 260 MB
        # graphs interrupted — RESUMES here instead of silently serving
        # random-init weights
        from .assets.fetch import fetch_all

        fetch_all(target)
        if not os.path.exists(os.path.join(target, "params.npz")):
            from .utils.logging import default_logger as log

            log.warning(
                "assets_fetched_unconverted", dir=target,
                hint="run tools/convert_onnx.py for native weights, or use "
                     "assets.load_onnx_pipeline for the graph backend",
            )
        return target

    @property
    def sample_rate(self) -> int:
        return self.cfg.sample_rate

    def get_voice_style(self, voice_name: str = "M1") -> VoiceStyle:
        return self.assets.get_voice_style(voice_name)

    def synthesize(
        self,
        text: str,
        voice_style: VoiceStyle,
        lang: str = "en",
        total_step: int = 5,
        speed: float = 1.05,
        silence_duration: float = 0.3,
        crossfade_duration: float = 0.0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (wav [1, n_samples], duration [1]) like the reference."""
        return self.engine(
            text, lang, voice_style, total_step, speed,
            silence_duration, crossfade_duration,
        )

    def synthesize_batch(
        self,
        texts: list[str],
        langs: list[str],
        voice_style: VoiceStyle,
        total_step: int = 5,
        speed: float = 1.05,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.engine.batch(texts, langs, voice_style, total_step, speed)

    def save_audio(self, wav: np.ndarray, path: str) -> None:
        from .utils import write_wav

        write_wav(path, np.asarray(wav).reshape(-1), self.sample_rate)


__all__ = [
    "AVAILABLE_LANGS",
    "SynthesisEngine",
    "TTS",
    "TTSConfig",
    "VOICE_PRESETS",
    "VoiceStyle",
    "__version__",
]
