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
    ):
        from .assets import load_assets

        if auto_download and assets_dir is None:
            # No egress in this environment; honored when a mirror is mounted.
            assets_dir = "assets"
        self.assets = load_assets(assets_dir, seed=seed)
        self.cfg = self.assets.cfg
        self.engine = SynthesisEngine(
            self.assets.params, self.cfg, self.assets.processor,
            precision=precision, seed=seed,
        )

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
