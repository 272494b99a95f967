"""Native->ONNX exporter + structural auto-mapper (VERDICT r2 item 3).

Round-trip proof: native params -> reference-format ONNX bundle with
ANONYMIZED initializer names -> automap back with zero name information ->
bit-equal params; and the converted native engine's waveform matches the
graph executor's on identical injected noise (the item's Done criterion).
"""

import json
import os

import numpy as np
import pytest

from supertonic_tpu.assets import onnx_export as E
from supertonic_tpu.assets.automap import (AutomapError, automap_bundle,
                                           automap_graph)
from supertonic_tpu.assets.onnx_exec import OnnxExecutor
from supertonic_tpu.assets.onnx_reader import load_onnx, parse_model
from supertonic_tpu.assets.store import flatten_tree
from supertonic_tpu.frontend import build_default_indexer
from supertonic_tpu.models import (duration_predictor, init_all, text_encoder,
                                   vector_estimator, vocoder)

F32 = np.float32


@pytest.fixture(scope="module")
def setup(tiny_config):
    params = init_all(42, tiny_config)
    rng = np.random.default_rng(0)
    B, L = 2, 12
    ids = rng.integers(1, 200, (B, L)).astype(np.int64)
    mask = np.ones((B, 1, L), F32)
    mask[1, :, 9:] = 0
    sdp = rng.standard_normal(
        (B, tiny_config.dp.style.n_style,
         tiny_config.dp.style.style_value_dim)).astype(F32)
    sttl = rng.standard_normal(
        (B, tiny_config.ttl.style.n_style,
         tiny_config.ttl.style.style_value_dim)).astype(F32)
    return tiny_config, params, ids, mask, sdp, sttl


def test_exported_graphs_match_native_modules(setup):
    """Each exported graph, run by the executor, reproduces models/*.apply
    to f32 tolerance — including masked LARoPE attention, AdaLN, the
    in-graph Euler update, and the subpixel vocoder."""
    import jax.numpy as jnp

    cfg, params, ids, mask, sdp, sttl = setup
    rng = np.random.default_rng(1)
    mk = lambda b: OnnxExecutor(parse_model(b), matmul_precision="float32")  # noqa: E731

    (dur,) = mk(E.export_duration_predictor(params["duration_predictor"],
                                            cfg)).run(
        None, {"text_ids": ids, "style_dp": sdp, "text_mask": mask})
    want = np.asarray(duration_predictor.apply(
        params["duration_predictor"], cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(sdp), jnp.asarray(mask[:, 0, :])))
    np.testing.assert_allclose(dur, want, rtol=1e-5, atol=1e-6)

    (emb,) = mk(E.export_text_encoder(params["text_encoder"], cfg)).run(
        None, {"text_ids": ids, "style_ttl": sttl, "text_mask": mask})
    emb_want = np.asarray(text_encoder.apply(
        params["text_encoder"], cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(sttl), jnp.asarray(mask[:, 0, :])))
    np.testing.assert_allclose(emb, emb_want.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)

    T, C = 10, cfg.latent_channels
    lmask = np.ones((2, 1, T), F32)
    lmask[1, :, 8:] = 0
    lat = (rng.standard_normal((2, C, T)).astype(F32)) * lmask
    cur = np.zeros((2,), F32)
    tot = np.full((2,), 4.0, F32)
    (nxt,) = mk(E.export_vector_estimator(params["vector_estimator"],
                                          cfg)).run(
        None, {"noisy_latent": lat, "text_emb": emb, "style_ttl": sttl,
               "text_mask": mask, "latent_mask": lmask,
               "current_step": cur, "total_step": tot})
    nxt_want = np.asarray(vector_estimator.step(
        params["vector_estimator"], cfg,
        jnp.asarray(lat.transpose(0, 2, 1)), jnp.asarray(emb_want),
        jnp.asarray(sttl), jnp.asarray(mask[:, 0, :]),
        jnp.asarray(lmask[:, 0, :]), jnp.asarray(cur), jnp.asarray(tot)))
    np.testing.assert_allclose(nxt, nxt_want.transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-5)

    (wav,) = mk(E.export_vocoder(params["vocoder"], cfg)).run(
        None, {"latent": lat})
    wav_want = np.asarray(vocoder.apply(
        params["vocoder"], cfg, jnp.asarray(lat.transpose(0, 2, 1))))
    assert wav.shape == wav_want.shape == (2, T * cfg.chunk_size)
    np.testing.assert_allclose(wav, wav_want, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def anon_bundle(setup, tmp_path_factory):
    cfg, params, *_ = setup
    d = str(tmp_path_factory.mktemp("anon_bundle"))
    E.export_bundle(params, cfg, d, indexer=build_default_indexer(),
                    anonymize=True)
    return d


def test_automap_roundtrip_bit_equal(setup, anon_bundle):
    """Zero name information -> every param recovered exactly."""
    cfg, params, *_ = setup
    got, reports = automap_bundle(anon_bundle, cfg, seed=0)
    fw, fg = flatten_tree(params), flatten_tree(got)
    assert set(fw) == set(fg)
    for k in fw:
        np.testing.assert_array_equal(fw[k], fg[k], err_msg=k)
    for model, rep in reports.items():
        assert rep["matched_params"] > 0
        assert rep["consts_checked"] > 0


def test_automapped_native_engine_matches_executor(setup, anon_bundle):
    """The item's Done criterion: the converted NATIVE engine's waveform
    matches the graph executor's to parity tolerance, same injected noise,
    no hand-written mapping anywhere."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline
    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor

    cfg, params, *_ = setup
    native_params, _ = automap_bundle(anon_bundle, cfg, seed=0)
    proc = UnicodeProcessor(build_default_indexer())
    eng = SynthesisEngine(native_params, cfg, proc, precision="f32",
                          egress_format="f32")
    pipe = load_onnx_pipeline(anon_bundle, matmul_precision="float32")
    rng = np.random.default_rng(5)
    style = VoiceStyle(
        rng.standard_normal((1, cfg.ttl.style.n_style,
                             cfg.ttl.style.style_value_dim)).astype(F32),
        rng.standard_normal((1, cfg.dp.style.n_style,
                             cfg.dp.style.style_value_dim)).astype(F32))
    text, lang = "The automapper proof sentence.", "en"

    # shared noise at the executor pipeline's latent geometry
    (d0,) = pipe.dp.run(None, {
        "text_ids": pipe.processor([text], [lang])[0].astype(np.int64),
        "style_dp": style.dp,
        "text_mask": pipe.processor([text], [lang])[1].astype(F32)})
    dur = np.asarray(d0, F32) / 1.05
    chunk = cfg.chunk_size
    t_lat = max(1, int((dur.max() * cfg.sample_rate + chunk - 1) // chunk))
    noise = rng.standard_normal(
        (1, cfg.latent_channels, t_lat)).astype(F32)

    wav_pipe, dur_pipe = pipe._infer([text], [lang], style, 3, noise=noise)
    wav_nat, dur_nat = eng.infer_batch([text], [lang], style, 3, 1.05,
                                       noise=noise.transpose(0, 2, 1))
    np.testing.assert_allclose(dur_nat, dur_pipe, rtol=1e-5, atol=1e-6)
    n = min(wav_pipe.shape[1], wav_nat.shape[1])
    np.testing.assert_allclose(wav_nat[:, :n], wav_pipe[:, :n],
                               rtol=1e-3, atol=2e-4)


def test_automap_rejects_foreign_architecture(setup, tmp_path):
    """Graphs that are NOT structurally equivalent must fail loudly, not
    mis-map (here: a config with different layer count)."""
    import dataclasses

    from supertonic_tpu.config import VectorEstimatorHParams

    cfg, params, *_ = setup
    other = dataclasses.replace(
        cfg, vector_estimator=dataclasses.replace(
            cfg.vector_estimator, n_layers=cfg.vector_estimator.n_layers + 1))
    d = str(tmp_path / "bundle")
    E.export_bundle(params, cfg, d, anonymize=True)
    with pytest.raises(AutomapError):
        automap_bundle(d, other, seed=0)


def test_automap_detects_structural_constant_drift(setup):
    """Same topology but different config values (RoPE tables etc.) must be
    caught by the constant value check."""
    import dataclasses

    cfg, params, *_ = setup
    foreign = parse_model(E.export_vector_estimator(
        params["vector_estimator"], cfg, anonymize=True))
    other = dataclasses.replace(
        cfg, vector_estimator=dataclasses.replace(
            cfg.vector_estimator, larope_theta=777.0))
    skeleton = parse_model(E.export_vector_estimator(
        init_all(0, other)["vector_estimator"], other))
    with pytest.raises(AutomapError, match="constant"):
        automap_graph(foreign, skeleton, model="vector_estimator")


def test_convert_cli_automaps_without_mapping(setup, anon_bundle, tmp_path,
                                              capsys, monkeypatch):
    """tools/convert_onnx.py with NO --mapping produces a bundle the native
    TTS loads and synthesizes from (the day-one conversion path)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                     "tools"))
    import convert_onnx

    cfg, params, *_ = setup
    out = str(tmp_path / "native_bundle")
    monkeypatch.setattr(_sys, "argv", [
        "convert_onnx.py", "--onnx-dir", anon_bundle, "--out", out])
    convert_onnx.main()
    assert "automapped vector_estimator" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out, "params.npz"))

    from supertonic_tpu import TTS

    tts = TTS(out)
    assert tts.engine.__class__.__name__ == "SynthesisEngine"
    wav, dur = tts.synthesize("Converted bundle check.",
                              tts.get_voice_style("M1"), total_step=2)
    assert wav.shape[1] > 0 and float(dur[0]) > 0
