from .buckets import latent_len_for_duration, pick_bucket
from .engine import SynthesisEngine, VoiceStyle
from .stitch import stitch
from .synthesis import (
    acoustic_stage,
    jit_acoustic_stage,
    jit_text_stage,
    synthesize_padded,
    text_stage,
)

__all__ = [
    "SynthesisEngine",
    "VoiceStyle",
    "acoustic_stage",
    "jit_acoustic_stage",
    "jit_text_stage",
    "latent_len_for_duration",
    "pick_bucket",
    "stitch",
    "synthesize_padded",
    "text_stage",
]
