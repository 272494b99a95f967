"""W8A8 int8 quantized serving path (opt-in, SynthesisEngine precision="int8").

The int8 path quantizes the vector-estimator block matmuls (the only network
inside the ``total_step``x hot loop) with per-output-channel int8 weights and
dynamic per-token activation scales; attention einsums / norms / AdaLN stay
bf16. These tests pin (a) per-layer quantization error bounds, (b) whole-step
consistency vs the f32 path, and (c) the engine wiring end-to-end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from supertonic_tpu.models import layers as L
from supertonic_tpu.models import init_all, quantize_params, vector_estimator


def test_quantized_linear_matches_f32(rng):
    p = L.linear_init(np.random.default_rng(1), 64, 96)
    p["w"] = rng.standard_normal((64, 96)).astype(np.float32) * 0.05
    p["b"] = rng.standard_normal((96,)).astype(np.float32) * 0.01
    q = L.quantize_linear(p)
    assert q["w_q"].dtype == np.int8
    assert q["w_scale"].shape == (96,)

    x = jnp.asarray(rng.standard_normal((4, 17, 64)), jnp.float32)
    y_ref = np.asarray(L.linear(p, x))
    y_q = np.asarray(L.linear(q, x))
    # relative RMS error of a W8A8 matmul at these shapes is ~1e-2
    rel = np.linalg.norm(y_q - y_ref) / np.linalg.norm(y_ref)
    assert rel < 0.02, rel


def test_quantized_linear_zero_weights_exact():
    # zero-init layers (AdaLN-Zero, out_proj) must quantize exactly
    p = {"w": np.zeros((8, 16), np.float32), "b": np.zeros((16,), np.float32)}
    q = L.quantize_linear(p)
    x = jnp.ones((2, 8))
    assert np.all(np.asarray(L.linear(q, x)) == 0.0)


def test_quantize_params_structure(tiny_config, rng):
    params = init_all(0, tiny_config)
    qp = quantize_params(params)
    blk = qp["vector_estimator"]["blocks"][0]
    for sub in ("self", "cross"):
        for k in ("q", "k", "v", "o"):
            assert "w_q" in blk[sub][k]
            assert blk[sub][k]["w_q"].dtype == np.int8
    assert "w_q" in blk["ffn"]["in"] and "w_q" in blk["ffn"]["out"]
    # non-block weights and other networks untouched
    assert "w" in qp["vector_estimator"]["in_proj"]
    assert "w" in qp["text_encoder"]["blocks"][0]["ffn"]["in"] \
        if "ffn" in qp["text_encoder"]["blocks"][0] else True
    # AdaLN stays f32 (modulation-critical, negligible FLOPs)
    assert "w" in blk["adaln"]


def test_estimator_step_int8_consistency(tiny_config, rng):
    """One full flow step through quantized blocks stays close to f32."""
    cfg = tiny_config
    params = init_all(0, cfg)["vector_estimator"]
    # AdaLN-Zero init zeroes adaln_out/out_proj, making the step an exact
    # identity (velocity == 0) — the comparison would pass VACUOUSLY.
    # De-zero them so the quantized matmuls actually reach the output.
    from supertonic_tpu.models import layers as L

    hp = cfg.vector_estimator
    params = dict(params)
    params["adaln_out"] = L.linear_init(
        np.random.default_rng(7), hp.dim, 2 * hp.dim)
    params["out_proj"] = L.linear_init(
        np.random.default_rng(8), hp.dim, cfg.latent_channels)
    # per-block AdaLN gates are ALSO zero at init (each sublayer's output is
    # gated off, so quantized projections would never reach the residual)
    params["blocks"] = [dict(bp) for bp in params["blocks"]]
    for i, bp in enumerate(params["blocks"]):
        din, dout = bp["adaln"]["w"].shape
        bp["adaln"] = L.linear_init(np.random.default_rng(10 + i), din, dout)
    qparams = quantize_params({"vector_estimator": params})["vector_estimator"]

    b, T, Lx = 2, 16, 12
    c = cfg.latent_channels
    latent = jnp.asarray(rng.standard_normal((b, T, c)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, Lx, cfg.ttl.proj_out_odim)),
                      jnp.float32)
    sttl = jnp.asarray(
        rng.standard_normal((b, 4, cfg.ttl.style.style_value_dim)), jnp.float32)
    tmask = jnp.ones((b, Lx), jnp.float32)
    lmask = jnp.ones((b, T), jnp.float32)
    cur = jnp.zeros((b,), jnp.float32)
    tot = jnp.full((b,), 4.0, jnp.float32)

    out_f32 = np.asarray(vector_estimator.step(
        params, cfg, latent, emb, sttl, tmask, lmask, cur, tot))
    out_q = np.asarray(vector_estimator.step(
        qparams, cfg, latent, emb, sttl, tmask, lmask, cur, tot))
    # guard against vacuity: the quantized path must actually perturb the
    # output (int8 rounding is real), just not by much
    assert not np.array_equal(out_q, out_f32)
    # the Euler update is dominated by x_t itself; the quantized velocity
    # perturbation must stay small relative to the step output
    rel = np.linalg.norm(out_q - out_f32) / np.linalg.norm(out_f32)
    assert rel < 0.05, rel


def test_engine_int8_end_to_end(tiny_config):
    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer

    proc = UnicodeProcessor(build_default_indexer())
    params = init_all(0, tiny_config)
    style = VoiceStyle(
        ttl=np.random.default_rng(2).standard_normal(
            (1, 4, tiny_config.ttl.style.style_value_dim)).astype(np.float32),
        dp=np.random.default_rng(3).standard_normal(
            (1, 4, tiny_config.dp.style.style_value_dim)).astype(np.float32),
    )
    eng = SynthesisEngine(params, tiny_config, proc, precision="int8")
    wav, dur = eng.batch(["Hello there."], ["en"], style, 2, 1.0)
    assert np.isfinite(np.asarray(dur)).all()
    assert wav.shape[0] == 1 and wav.shape[1] > 0
    assert np.isfinite(wav).all()
    assert np.abs(np.asarray(wav)).max() > 0


def test_int8_tp_pspecs(tiny_config):
    """Quantized trees get valid TP shardings: w_q shards like w, w_scale
    like the bias."""
    from jax.sharding import PartitionSpec as P

    from supertonic_tpu.parallel.mesh import MODEL_AXIS, param_pspecs

    params = quantize_params(init_all(0, tiny_config))
    specs = param_pspecs(params)
    blk = specs["vector_estimator"]["blocks"][0]
    assert blk["ffn"]["in"]["w_q"] == P(None, MODEL_AXIS)
    assert blk["ffn"]["in"]["w_scale"] == P(MODEL_AXIS)
    assert blk["ffn"]["out"]["w_q"] == P(MODEL_AXIS, None)
    assert blk["ffn"]["out"]["w_scale"] == P()
    assert blk["self"]["q"]["w_q"] == P(None, MODEL_AXIS)
    assert blk["self"]["o"]["w_q"] == P(MODEL_AXIS, None)
