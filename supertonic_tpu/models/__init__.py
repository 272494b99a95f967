"""The four networks of the Supertonic pipeline (SURVEY.md §2.2), as
functional JAX modules with explicit param pytrees."""

import numpy as np

from . import duration_predictor, text_encoder, vector_estimator, vocoder
from .layers import count_params


def init_all(seed: int, cfg):
    """Initialize all four networks from an int seed (numpy RNG — see
    layers.py init note). Returns a dict with keys matching the reference's
    ONNX graph names (duration_predictor / text_encoder / vector_estimator /
    vocoder, reference py/helper.py:297-300)."""
    rng = np.random.default_rng(seed)
    return {
        "duration_predictor": duration_predictor.init(rng, cfg),
        "text_encoder": text_encoder.init(rng, cfg),
        "vector_estimator": vector_estimator.init(rng, cfg),
        "vocoder": vocoder.init(rng, cfg),
    }


__all__ = [
    "count_params",
    "duration_predictor",
    "init_all",
    "text_encoder",
    "vector_estimator",
    "vocoder",
]
