"""Reference-compatible API layer.

Drop-in surface for code written against the reference's Python helper
(reference py/helper.py): same class names, same call signatures, same
tensor layouts — backed by the TPU engine instead of ONNX Runtime.

    from supertonic_tpu.compat import (
        load_text_to_speech, load_voice_style, chunk_text, TextToSpeech)

    tts = load_text_to_speech("assets")          # py/helper.py:322-336
    style = load_voice_style(["voice_styles/M1.json"])
    wav, dur = tts(text, "en", style, total_step=5, speed=1.05)
    wav, dur = tts.batch(texts, langs, style, 5)

Layout notes: the reference feeds/returns channel-first latents [B, C, T]
and masks [B, 1, L]; these wrappers accept/return those layouts and
translate to the engine's [B, T, C].
"""

from __future__ import annotations

import numpy as np

from .assets import load_assets, load_voice_style as _load_style_files
from .config import AVAILABLE_LANGS  # noqa: F401  (re-export, py/helper.py:13)
from .engine import SynthesisEngine, VoiceStyle
from .frontend import chunk_text  # noqa: F401  (re-export, py/helper.py:388)
from .frontend import UnicodeProcessor as _Processor
from .frontend import length_to_mask, get_latent_mask  # noqa: F401
from .utils import sanitize_filename, timer  # noqa: F401  (py/helper.py:370-385)


class UnicodeProcessor(_Processor):
    """Reference-layout processor: __call__ returns mask [B, 1, L]
    (py/helper.py:117-131). The engine-native class returns the same —
    re-exported here under the reference name."""


class Style(VoiceStyle):
    """Reference name for the style pair (py/helper.py:134-138)."""

    def __init__(self, style_ttl_onnx: np.ndarray, style_dp_onnx: np.ndarray):
        super().__init__(np.asarray(style_ttl_onnx), np.asarray(style_dp_onnx))


def load_voice_style(voice_style_paths: list[str], verbose: bool = False) -> Style:
    vs = _load_style_files(voice_style_paths, verbose)
    return Style(vs.ttl, vs.dp)


class TextToSpeech:
    """Reference TextToSpeech surface (py/helper.py:140-254) over the
    engine. ``__call__(text, lang, style, total_step, speed,
    silence_duration)`` and ``batch(...)`` match exactly; sample_rate and
    cfgs attributes mirror the originals."""

    def __init__(self, engine: SynthesisEngine, cfgs: dict | None = None):
        self.engine = engine
        self.cfgs = cfgs or {}
        self.sample_rate = engine.cfg.sample_rate
        self.base_chunk_size = engine.cfg.ae.base_chunk_size
        self.chunk_compress_factor = engine.cfg.ttl.chunk_compress_factor
        self.ldim = engine.cfg.ttl.latent_dim

    def __call__(
        self,
        text: str,
        lang: str,
        style: VoiceStyle,
        total_step: int,
        speed: float = 1.05,
        silence_duration: float = 0.3,
    ) -> tuple[np.ndarray, np.ndarray]:
        assert style.ttl.shape[0] == 1, (
            "Single speaker text to speech only supports single style"
        )
        return self.engine(
            text, lang, style, total_step, speed, silence_duration
        )

    def batch(
        self,
        text_list: list[str],
        lang_list: list[str],
        style: VoiceStyle,
        total_step: int,
        speed: float = 1.05,
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.engine.batch(text_list, lang_list, style, total_step, speed)

    # ------------------------------------------------------------------
    # per-network access in the reference's ONNX session layout
    # ------------------------------------------------------------------

    def run_duration_predictor(self, text_ids, style_dp, text_mask):
        """feeds/outputs per SURVEY.md §2.2: text_ids i64 [B,L], style_dp
        [B,S,D], text_mask [B,1,L] -> duration f32 [B]."""
        import jax.numpy as jnp

        from .models import duration_predictor

        dur = duration_predictor.apply(
            self.engine.params["duration_predictor"], self.engine.cfg,
            jnp.asarray(text_ids), jnp.asarray(style_dp),
            jnp.asarray(np.asarray(text_mask)[:, 0, :]),
        )
        return np.asarray(dur)

    def run_text_encoder(self, text_ids, style_ttl, text_mask):
        import jax.numpy as jnp

        from .models import text_encoder

        emb = text_encoder.apply(
            self.engine.params["text_encoder"], self.engine.cfg,
            jnp.asarray(text_ids), jnp.asarray(style_ttl),
            jnp.asarray(np.asarray(text_mask)[:, 0, :]),
        )
        return np.asarray(emb)

    def run_vector_estimator(self, noisy_latent, text_emb, style_ttl,
                             text_mask, latent_mask, current_step, total_step):
        """noisy_latent [B, C, T] channel-first like the ONNX graph."""
        import jax.numpy as jnp

        from .models import vector_estimator

        x = jnp.asarray(np.transpose(np.asarray(noisy_latent), (0, 2, 1)))
        out = vector_estimator.step(
            self.engine.params["vector_estimator"], self.engine.cfg,
            x, jnp.asarray(text_emb), jnp.asarray(style_ttl),
            jnp.asarray(np.asarray(text_mask)[:, 0, :]),
            jnp.asarray(np.asarray(latent_mask)[:, 0, :]),
            jnp.asarray(current_step), jnp.asarray(total_step),
        )
        return np.transpose(np.asarray(out), (0, 2, 1))

    def run_vocoder(self, latent):
        """latent [B, C, T] -> wav [B, T*chunk] (SURVEY.md §2.2)."""
        import jax.numpy as jnp

        from .models import vocoder

        x = jnp.asarray(np.transpose(np.asarray(latent), (0, 2, 1)))
        return np.asarray(vocoder.apply(
            self.engine.params["vocoder"], self.engine.cfg, x
        ))


def load_text_to_speech(assets_dir: str | None = None,
                        use_gpu: bool = False, *,
                        backend: str = "auto"):
    """Reference loader shape (py/helper.py:322-336). ``use_gpu`` is accepted
    for signature parity; the accelerator is the TPU.

    ``backend``:
      * "native" — the tuned JAX models over a converted params bundle.
      * "onnx"   — the generic graph executor running the four REAL .onnx
        files from ``assets_dir`` (reference-identical semantics; needs the
        fetched graphs, see tools/fetch_assets.py).
      * "auto"   — "onnx" when ``assets_dir`` holds the four graphs but no
        converted params.npz, else "native".
    """
    import os

    graphs_dir = None
    if backend in ("auto", "onnx") and assets_dir:
        has_params = os.path.exists(os.path.join(assets_dir, "params.npz"))
        if backend == "onnx" or not has_params:
            # probe the flattened AND the assets/onnx bundle layouts, like
            # TTS._find_graphs — a fetched-but-unflattened bundle must never
            # silently fall through to random-init native weights, and an
            # explicit backend="onnx" must accept both layouts too
            for sub in ("", "onnx"):
                d = os.path.join(assets_dir, sub) if sub else assets_dir
                if all(os.path.exists(os.path.join(d, f"{m}.onnx"))
                       for m in ("duration_predictor", "text_encoder",
                                 "vector_estimator", "vocoder")):
                    graphs_dir = d
                    break
        if backend == "auto":
            backend = "onnx" if graphs_dir else "native"
    if backend == "onnx":
        from .assets.onnx_pipeline import load_onnx_pipeline

        return load_onnx_pipeline(graphs_dir or assets_dir)
    assets = load_assets(assets_dir)
    engine = SynthesisEngine(assets.params, assets.cfg, assets.processor)
    from .config import to_reference_dict

    return TextToSpeech(engine, to_reference_dict(assets.cfg))
