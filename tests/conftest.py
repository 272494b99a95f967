"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count), per the multi-host test strategy of
SURVEY.md §4; the real TPU chip is reserved for bench.py.
"""

import os

# This image's sitecustomize.py registers the axon TPU backend and imports
# jax at interpreter startup with JAX_PLATFORMS=axon, so env edits here are
# too late — override via jax.config instead (backends initialize lazily, so
# XLA_FLAGS set before the first jax.devices() call still applies).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persist XLA compiles across runs (compiles are slow on this host). Must go
# through jax.config — env vars are too late, sitecustomize imported jax.
from supertonic_tpu.utils.jaxenv import setup_compilation_cache  # noqa: E402

setup_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_config():
    """A scaled-down TTSConfig so model tests compile in milliseconds."""
    from supertonic_tpu.config import (
        AEConfig,
        DPConfig,
        DurationPredictorHParams,
        StyleTokenLayerConfig,
        TextEncoderHParams,
        TTLConfig,
        TTSConfig,
        VectorEstimatorHParams,
        VocoderHParams,
    )

    style = StyleTokenLayerConfig(n_style=4, style_value_dim=16)
    return TTSConfig(
        ae=AEConfig(sample_rate=16000, base_chunk_size=64),
        ttl=TTLConfig(
            chunk_compress_factor=2,
            latent_dim=8,
            proj_out_idim=32,
            proj_out_odim=64,
            style=style,
        ),
        dp=DPConfig(latent_dim=8, chunk_compress_factor=2, style=style),
        text_encoder=TextEncoderHParams(vocab_size=256, dim=32, n_layers=2, n_heads=2),
        duration_predictor=DurationPredictorHParams(
            vocab_size=256, dim=32, n_layers=2, n_heads=2
        ),
        vector_estimator=VectorEstimatorHParams(
            dim=64, n_layers=2, n_heads=2, time_embed_dim=32
        ),
        vocoder=VocoderHParams(
            dim=64,
            upsample_factors=(4, 4),
            channels=(32, 16),
            resblock_dilations=(1, 3),
        ),
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
