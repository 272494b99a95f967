"""Reference-compatible API surface tests (names/signatures of py/helper.py)."""

import numpy as np
import pytest

from supertonic_tpu.assets import Assets, save_assets, synthesize_default_styles
from supertonic_tpu.engine import SynthesisEngine
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all
from test_onnx_pipeline import onnx_dir  # noqa: F401


@pytest.fixture(scope="module")
def tts(tiny_config, tmp_path_factory):
    # build a real asset bundle and load through the compat loader
    d = tmp_path_factory.mktemp("assets")
    save_assets(str(d), tiny_config, init_all(0, tiny_config))
    from supertonic_tpu.compat import load_text_to_speech

    t = load_text_to_speech(str(d))
    t.engine.precision = "f32"
    return t


@pytest.fixture(scope="module")
def style(tts, tiny_config, tmp_path_factory):
    from supertonic_tpu.compat import load_voice_style
    from supertonic_tpu.assets import save_voice_style

    d = tmp_path_factory.mktemp("styles")
    styles = synthesize_default_styles(tiny_config)
    p1, p2 = str(d / "M1.json"), str(d / "F1.json")
    save_voice_style(p1, styles["M1"])
    save_voice_style(p2, styles["F1"])
    return load_voice_style([p1]), load_voice_style([p1, p2])


def test_call_signature_matches_reference(tts, style):
    single, _ = style
    wav, dur = tts("Compatibility check.", "en", single, 2, 1.05, 0.3)
    assert wav.shape[0] == 1
    assert dur.shape == (1,)
    assert wav.shape[1] >= int(tts.sample_rate * dur[0])


def test_batch_signature(tts, style):
    _, pair = style
    wav, dur = tts.batch(["One here.", "Two there."], ["en", "en"], pair, 2)
    assert wav.shape[0] == 2 and dur.shape == (2,)


def test_single_style_assertion(tts, style):
    _, pair = style
    with pytest.raises(AssertionError):
        tts("text", "en", pair, 2)


def test_cfg_attributes(tts, tiny_config):
    assert tts.sample_rate == tiny_config.sample_rate
    assert tts.base_chunk_size == tiny_config.ae.base_chunk_size
    assert tts.chunk_compress_factor == tiny_config.ttl.chunk_compress_factor
    assert tts.ldim == tiny_config.ttl.latent_dim
    assert tts.cfgs["ae"]["sample_rate"] == tiny_config.sample_rate


def test_per_network_onnx_layouts(tts, style, tiny_config):
    """The run_* methods speak the exact ONNX session layouts of
    SURVEY.md §2.2 ([B,1,L] masks, [B,C,T] latents)."""
    single, _ = style
    from supertonic_tpu.compat import UnicodeProcessor as CompatProcessor

    proc = CompatProcessor(build_default_indexer())
    ids, mask = proc(["Layout check."], ["en"])
    assert mask.ndim == 3 and mask.shape[1] == 1

    dur = tts.run_duration_predictor(ids, single.dp, mask)
    assert dur.shape == (1,) and dur[0] > 0

    emb = tts.run_text_encoder(ids, single.ttl, mask)
    assert emb.shape[:2] == (1, ids.shape[1])

    cfg = tiny_config
    t_lat = 8
    rng = np.random.default_rng(0)
    noisy = rng.standard_normal(
        (1, cfg.latent_channels, t_lat)).astype(np.float32)
    lat_mask = np.ones((1, 1, t_lat), np.float32)
    out = tts.run_vector_estimator(
        noisy, emb, single.ttl, mask, lat_mask,
        np.zeros(1, np.float32), np.full(1, 4.0, np.float32))
    assert out.shape == noisy.shape  # same [B, C, T] layout back

    wav = tts.run_vocoder(out)
    assert wav.shape == (1, t_lat * cfg.chunk_size)


def test_reexports():
    from supertonic_tpu.compat import (  # noqa: F401
        AVAILABLE_LANGS,
        chunk_text,
        get_latent_mask,
        length_to_mask,
        sanitize_filename,
        timer,
    )

    assert "en" in AVAILABLE_LANGS
    assert chunk_text("A. B.", max_len=4) == ["A.", "B."]


def test_compat_auto_backend_probes_onnx_subdir(onnx_dir, tmp_path):  # noqa: F811
    """A fetched-but-unflattened bundle (assets/onnx/*.onnx) must select the
    graph backend, never silently serve random-init native weights."""
    import os
    import shutil

    from supertonic_tpu.compat import load_text_to_speech

    root = tmp_path / "assets"
    (root / "onnx").mkdir(parents=True)
    for f in os.listdir(onnx_dir):
        shutil.copy(os.path.join(onnx_dir, f), root / "onnx" / f)
    tts = load_text_to_speech(str(root))
    from supertonic_tpu.assets.onnx_pipeline import OnnxPipeline

    assert isinstance(tts, OnnxPipeline)
