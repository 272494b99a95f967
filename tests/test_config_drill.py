"""Config drill: a tts.json with dims UNLIKE the defaults must re-derive the
whole native stack consistently (VERDICT r2 weak #2 de-risk: if the real
model lands at different shapes, nothing may be silently pinned to the
invented 66M-param defaults).

The foreign file changes every consumed knob (reference schema per
go/helper.go:25-84; the four inference-consumed values per
py/helper.py:156-159): sample_rate, base_chunk_size, chunk_compress_factor,
latent_dim, style-token dims — and the vocoder factor stack must
re-factorize for the new chunk size.
"""

import json

import numpy as np
import pytest

from supertonic_tpu.config import load_tts_json

FOREIGN = {
    "ae": {"sample_rate": 24000, "base_chunk_size": 128,
           "encoder": {"spec_processor": {"n_fft": 512, "win_length": 512,
                                          "hop_length": 128, "n_mels": 40,
                                          "eps": 1e-5, "norm_mean": -1.0,
                                          "norm_std": 2.0}}},
    "ttl": {"chunk_compress_factor": 6, "latent_dim": 16,
            "style_encoder": {"style_token_layer": {"n_style": 3,
                                                    "style_value_dim": 9}},
            "text_encoder": {"proj_out": {"idim": 48, "odim": 96}}},
    "dp": {"latent_dim": 16, "chunk_compress_factor": 6,
           "style_encoder": {"style_token_layer": {"n_style": 5,
                                                   "style_value_dim": 7}}},
}


@pytest.fixture(scope="module")
def foreign_cfg(tmp_path_factory):
    import dataclasses

    d = tmp_path_factory.mktemp("foreign_cfg")
    p = d / "tts.json"
    p.write_text(json.dumps(FOREIGN))
    cfg = load_tts_json(str(p))
    # shrink the (config-independent) net widths so CPU compiles stay fast;
    # the GEOMETRY under test all comes from the json above
    from supertonic_tpu.config import (DurationPredictorHParams,
                                       TextEncoderHParams,
                                       VectorEstimatorHParams)

    # the loader must have coupled the encoder width to proj_out.idim
    assert cfg.text_encoder.dim == 48
    return dataclasses.replace(
        cfg,
        text_encoder=TextEncoderHParams(vocab_size=256, dim=48, n_layers=1,
                                        n_heads=2),
        duration_predictor=DurationPredictorHParams(vocab_size=256, dim=32,
                                                    n_layers=1, n_heads=2),
        vector_estimator=VectorEstimatorHParams(dim=32, n_layers=1, n_heads=2,
                                                time_embed_dim=16),
    )


def test_geometry_rederives(foreign_cfg):
    cfg = foreign_cfg
    assert cfg.sample_rate == 24000
    assert cfg.chunk_size == 128 * 6 == 768
    assert cfg.latent_channels == 16 * 6 == 96
    assert cfg.ttl.style.n_style == 3 and cfg.ttl.style.style_value_dim == 9
    assert cfg.dp.style.n_style == 5 and cfg.dp.style.style_value_dim == 7
    assert cfg.ae.spec_processor.n_mels == 40
    # 768 is not divisible by the default prod(8,8)=64 head split choice's
    # chunk (512); the loader must have re-factorized with a matching
    # channel ladder and a >=16-sample subpixel head
    import math

    up = math.prod(cfg.vocoder.upsample_factors)
    assert cfg.chunk_size % up == 0
    assert cfg.chunk_size // up >= 16
    assert len(cfg.vocoder.channels) == len(cfg.vocoder.upsample_factors)


def test_roundtrip_preserves_foreign_values(foreign_cfg, tmp_path):
    from supertonic_tpu.config import to_reference_dict

    out = to_reference_dict(foreign_cfg)
    assert out["ae"]["sample_rate"] == 24000
    assert out["ae"]["base_chunk_size"] == 128
    assert out["ttl"]["chunk_compress_factor"] == 6
    assert out["ttl"]["latent_dim"] == 16
    ttl_tl = out["ttl"]["style_encoder"]["style_token_layer"]
    assert (ttl_tl["n_style"], ttl_tl["style_value_dim"]) == (3, 9)
    p = tmp_path / "tts.json"
    p.write_text(json.dumps(out))
    again = load_tts_json(str(p))
    assert again.chunk_size == foreign_cfg.chunk_size
    assert again.dp.style == foreign_cfg.dp.style


def test_native_stack_end_to_end_on_foreign_dims(foreign_cfg):
    """init_all + SynthesisEngine must run a full synthesis at the foreign
    geometry: style tensors at (1,3,9)/(1,5,7), waveform frames of 768
    samples, duration trimmed at 24 kHz."""
    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor
    from supertonic_tpu.frontend.normalize import build_default_indexer
    from supertonic_tpu.models import init_all

    cfg = foreign_cfg
    params = init_all(0, cfg)
    proc = UnicodeProcessor(
        build_default_indexer(vocab_cap=cfg.text_encoder.vocab_size))
    eng = SynthesisEngine(params, cfg, proc, precision="f32")
    rng = np.random.default_rng(0)
    style = VoiceStyle(
        rng.standard_normal((1, 3, 9)).astype(np.float32),
        rng.standard_normal((1, 5, 7)).astype(np.float32),
    )
    wav, dur = eng.batch(["A drill sentence."], ["en"], style, 2, 1.05)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert wav.shape[1] % cfg.chunk_size == 0
    assert float(dur[0]) > 0
    # the waveform must cover the predicted duration at the FOREIGN rate
    assert wav.shape[1] >= int(dur[0] * 24000)
    # and the engine must reject styles shaped for the DEFAULT config
    bad = VoiceStyle(
        rng.standard_normal((1, 50, 128)).astype(np.float32),
        rng.standard_normal((1, 50, 128)).astype(np.float32),
    )
    with pytest.raises(Exception):
        eng.batch(["Mismatched style."], ["en"], bad, 2, 1.05)


def test_synthetic_styles_follow_foreign_dims(foreign_cfg, tmp_path):
    """Asset-store fallback styles must take their shape from the loaded
    config, not from hardcoded defaults."""
    import dataclasses as dc
    import json as _json

    from supertonic_tpu.assets.store import load_assets
    from supertonic_tpu.config import to_reference_dict

    d = tmp_path / "bundle"
    d.mkdir()
    (d / "tts.json").write_text(_json.dumps(to_reference_dict(foreign_cfg)))
    assets = load_assets(str(d), init_params=False)
    style = assets.get_voice_style("M1")
    assert style.ttl.shape == (1, 3, 9)
    assert style.dp.shape == (1, 5, 7)
    assert dc.asdict(assets.cfg.ttl.style) == {"n_style": 3,
                                               "style_value_dim": 9}
