import json

import pytest

from supertonic_tpu.config import (
    TTSConfig,
    load_tts_json,
    to_reference_dict,
    tts_config_from_reference_dict,
)


def test_default_geometry():
    cfg = TTSConfig()
    assert cfg.chunk_size == 512 * 4
    assert cfg.latent_channels == 24 * 4
    assert cfg.sample_rate == 44100


def test_vocoder_factors_divide_chunk():
    import math

    cfg = TTSConfig()
    prod = math.prod(cfg.vocoder.upsample_factors)
    assert cfg.chunk_size % prod == 0
    from supertonic_tpu.models.vocoder import final_depth

    assert final_depth(cfg) == cfg.chunk_size // prod
    assert final_depth(cfg) >= 1


def test_reference_json_roundtrip(tmp_path):
    cfg = TTSConfig()
    d = to_reference_dict(cfg)
    p = tmp_path / "tts.json"
    p.write_text(json.dumps(d))
    cfg2 = load_tts_json(str(p))
    assert cfg2.ae.sample_rate == cfg.ae.sample_rate
    assert cfg2.ttl.latent_dim == cfg.ttl.latent_dim
    assert cfg2.chunk_size == cfg.chunk_size
    assert cfg2.dp.style.n_style == cfg.dp.style.n_style


def test_foreign_chunk_size_refactorizes():
    import math

    raw = {
        "ae": {"sample_rate": 24000, "base_chunk_size": 256},
        "ttl": {"chunk_compress_factor": 2, "latent_dim": 16},
    }
    cfg = tts_config_from_reference_dict(raw)
    assert cfg.chunk_size == 512
    assert cfg.chunk_size % math.prod(cfg.vocoder.upsample_factors) == 0


def test_mismatched_factors_raise():
    from supertonic_tpu.config import VocoderHParams

    with pytest.raises(ValueError):
        TTSConfig(vocoder=VocoderHParams(upsample_factors=(3,), channels=(64,)))
    with pytest.raises(ValueError):
        TTSConfig(vocoder=VocoderHParams(upsample_factors=(8, 8), channels=(64,)))
