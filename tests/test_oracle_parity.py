"""Numerical parity: JAX modules (f32) vs the independent numpy oracle.

Same harness shape as the eventual ONNX-oracle comparison (SURVEY.md §4):
identical params + identical inputs (including injected noise) -> allclose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supertonic_tpu.models import (
    duration_predictor,
    init_all,
    text_encoder,
    vector_estimator,
    vocoder,
)

import oracle_numpy as oracle


@pytest.fixture(scope="module")
def setup(tiny_config):
    cfg = tiny_config
    params = init_all(0, cfg)
    # randomize the zero-init heads so parity covers them too
    rng = np.random.default_rng(42)
    ve = params["vector_estimator"]
    for key in ("out_proj", "adaln_out"):
        ve[key]["w"] = (rng.standard_normal(ve[key]["w"].shape) * 0.05).astype(
            np.float32
        )
    for bp in ve["blocks"]:
        bp["adaln"]["w"] = (
            rng.standard_normal(bp["adaln"]["w"].shape) * 0.05
        ).astype(np.float32)

    b, l, t = 2, 16, 12
    inputs = {
        "text_ids": rng.integers(1, 200, (b, l)),
        "text_mask": (np.arange(l)[None] < np.array([[l], [l - 5]])).astype(
            np.float32
        ),
        "style": rng.standard_normal(
            (b, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
        ).astype(np.float32),
        "latent": rng.standard_normal((b, t, cfg.latent_channels)).astype(
            np.float32
        ),
        "latent_mask": (np.arange(t)[None] < np.array([[t], [t - 4]])).astype(
            np.float32
        ),
    }
    return cfg, params, inputs


def test_duration_predictor_parity(setup):
    cfg, params, x = setup
    got = jax.jit(lambda: duration_predictor.apply(
        params["duration_predictor"], cfg, jnp.asarray(x["text_ids"]),
        jnp.asarray(x["style"]), jnp.asarray(x["text_mask"])))()
    want = oracle.duration_predictor(
        params["duration_predictor"], cfg, x["text_ids"], x["style"],
        x["text_mask"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_text_encoder_parity(setup):
    cfg, params, x = setup
    got = jax.jit(lambda: text_encoder.apply(
        params["text_encoder"], cfg, jnp.asarray(x["text_ids"]),
        jnp.asarray(x["style"]), jnp.asarray(x["text_mask"])))()
    want = oracle.text_encoder(
        params["text_encoder"], cfg, x["text_ids"], x["style"], x["text_mask"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_vector_estimator_parity(setup):
    cfg, params, x = setup
    emb = oracle.text_encoder(
        params["text_encoder"], cfg, x["text_ids"], x["style"], x["text_mask"])
    b = emb.shape[0]
    cur = np.array([1.0, 1.0], np.float32)
    tot = np.array([4.0, 4.0], np.float32)
    got = jax.jit(lambda: vector_estimator.step(
        params["vector_estimator"], cfg, jnp.asarray(x["latent"]),
        jnp.asarray(emb), jnp.asarray(x["style"]),
        jnp.asarray(x["text_mask"]), jnp.asarray(x["latent_mask"]),
        jnp.asarray(cur), jnp.asarray(tot)))()
    want = oracle.vector_estimator_step(
        params["vector_estimator"], cfg, x["latent"], emb, x["style"],
        x["text_mask"], x["latent_mask"], cur, tot)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_vocoder_parity(setup):
    cfg, params, x = setup
    got = jax.jit(lambda: vocoder.apply(
        params["vocoder"], cfg, jnp.asarray(x["latent"])))()
    want = oracle.vocoder(params["vocoder"], cfg, x["latent"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_full_euler_loop_parity(setup):
    """total_step Euler iterations, identical injected noise — the same
    end-to-end check the ONNX parity gate will run (noise-as-input,
    SURVEY.md §2.2)."""
    cfg, params, x = setup
    emb = oracle.text_encoder(
        params["text_encoder"], cfg, x["text_ids"], x["style"], x["text_mask"])
    steps = 3
    tot = np.full((2,), float(steps), np.float32)
    xt = x["latent"] * x["latent_mask"][:, :, None]
    for s in range(steps):
        xt = oracle.vector_estimator_step(
            params["vector_estimator"], cfg, xt, emb, x["style"],
            x["text_mask"], x["latent_mask"],
            np.full((2,), float(s), np.float32), tot)
    want = oracle.vocoder(params["vocoder"], cfg, xt)

    from supertonic_tpu.engine import acoustic_stage

    got = jax.jit(lambda: acoustic_stage(
        params, cfg, jnp.asarray(emb), jnp.asarray(x["style"]),
        jnp.asarray(x["text_mask"]), jnp.asarray(x["latent_mask"]),
        jnp.asarray(x["latent"]), steps, precision="f32"))()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
