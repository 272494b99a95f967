"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count), per the multi-host test strategy of
SURVEY.md §4; the real TPU chip is reserved for bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    """A scaled-down TTSConfig so model tests compile in milliseconds."""
    from supertonic_tpu.config import (
        AEConfig,
        DurationPredictorHParams,
        TextEncoderHParams,
        TTLConfig,
        TTSConfig,
        VectorEstimatorHParams,
        VocoderHParams,
    )

    return TTSConfig(
        ae=AEConfig(sample_rate=16000, base_chunk_size=64),
        ttl=TTLConfig(chunk_compress_factor=2, latent_dim=8),
        text_encoder=TextEncoderHParams(vocab_size=256, dim=32, n_layers=2, n_heads=2),
        duration_predictor=DurationPredictorHParams(
            vocab_size=256, dim=32, n_layers=2, n_heads=2
        ),
        vector_estimator=VectorEstimatorHParams(
            dim=64, n_layers=2, n_heads=2, time_embed_dim=32
        ),
        vocoder=VocoderHParams(
            dim=64,
            upsample_factors=(4, 4, 4, 2),
            channels=(32, 32, 16, 16),
            resblock_dilations=(1, 3),
        ),
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
