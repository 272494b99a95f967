"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supertonic_tpu.models.layers import attention_core
from supertonic_tpu.ops import fused_attention_interpret


def _qkv(b=2, h=2, tq=16, tk=24, d=32, seed=0, dtype=jnp.float32):
    # [B, T, H, Dh] layout (models/layers.py attention contract)
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)), dtype)
    mask = jnp.asarray(
        (np.arange(tk)[None, :] < rng.integers(4, tk + 1, (b, 1))).astype(np.float32)
    )
    return q, k, v, mask


def test_fused_attention_matches_xla_masked():
    q, k, v, mask = _qkv()
    ref = attention_core(q, k, v, mask)
    out = fused_attention_interpret(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_matches_xla_unmasked():
    q, k, v, _ = _qkv(seed=1)
    ref = attention_core(q, k, v, None)
    out = fused_attention_interpret(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_bf16():
    q, k, v, mask = _qkv(seed=2, dtype=jnp.bfloat16)
    ref = attention_core(q, k, v, mask)
    out = fused_attention_interpret(q, k, v, mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_attention_fully_masked_row_safe():
    # rows with zero valid keys must not produce NaN
    q, k, v, _ = _qkv(seed=3)
    mask = jnp.zeros((q.shape[0], k.shape[1]), jnp.float32)
    out = np.asarray(fused_attention_interpret(q, k, v, mask))
    assert np.isfinite(out).all()


def test_model_with_fused_attention_matches(tiny_config):
    """Whole vector-estimator step with the pallas kernel vs XLA attention."""
    from supertonic_tpu.models import init_all, text_encoder, vector_estimator

    params = init_all(0, tiny_config)
    rng = np.random.default_rng(0)
    cfg = tiny_config
    b, l, t = 2, 16, 12
    ids = jnp.asarray(rng.integers(1, 200, (b, l)))
    tmask = jnp.ones((b, l), jnp.float32)
    style = jnp.asarray(rng.standard_normal(
        (b, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((b, t, cfg.latent_channels)), jnp.float32)
    lmask = jnp.ones((b, t), jnp.float32)

    emb = jax.jit(lambda: text_encoder.apply(
        params["text_encoder"], cfg, ids, style, tmask))()

    def step_with(attn_fn):
        return vector_estimator.step(
            params["vector_estimator"], cfg, lat, emb, style, tmask, lmask,
            jnp.zeros((b,)), jnp.full((b,), 4.0), attn_fn=attn_fn,
        )

    ref = jax.jit(lambda: step_with(attention_core))()
    out = jax.jit(lambda: step_with(fused_attention_interpret))()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


class TestFusedFFN:
    def test_matches_xla_path(self, tiny_config):
        """Fused AdaLN-FFN kernel vs the unfused block math (f32)."""
        from supertonic_tpu.models import init_all, vector_estimator, text_encoder

        params = init_all(0, tiny_config)
        # randomize AdaLN so modulation is exercised
        rng = np.random.default_rng(9)
        for bp in params["vector_estimator"]["blocks"]:
            bp["adaln"]["w"] = (
                rng.standard_normal(bp["adaln"]["w"].shape) * 0.05
            ).astype(np.float32)
        cfg = tiny_config
        b, l, t = 2, 16, 12
        ids = jnp.asarray(rng.integers(1, 200, (b, l)))
        tmask = jnp.ones((b, l), jnp.float32)
        style = jnp.asarray(rng.standard_normal(
            (b, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)),
            jnp.float32)
        lat = jnp.asarray(rng.standard_normal((b, t, cfg.latent_channels)),
                          jnp.float32)
        lmask = jnp.ones((b, t), jnp.float32)
        emb = jax.jit(lambda: text_encoder.apply(
            params["text_encoder"], cfg, ids, style, tmask))()

        def step(fused):
            return vector_estimator.step(
                params["vector_estimator"], cfg, lat, emb, style, tmask,
                lmask, jnp.zeros((b,)), jnp.full((b,), 4.0),
                fused_ffn=fused,
            )

        ref = jax.jit(lambda: step(False))()
        got = jax.jit(lambda: step(True))()
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_kernel_direct(self):
        from supertonic_tpu.ops.ffn import fused_adaln_ffn

        rng = np.random.default_rng(0)
        b, t, d, f = 2, 8, 32, 64
        x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
        g = jnp.ones((d,), jnp.float32)
        bb = jnp.zeros((d,), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
        b1 = jnp.zeros((f,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
        b2 = jnp.zeros((d,), jnp.float32)
        shift = jnp.zeros((b, 1, d), jnp.float32)
        scale = jnp.zeros((b, 1, d), jnp.float32)
        gate = jnp.ones((b, 1, d), jnp.float32)
        out = fused_adaln_ffn(x, g, bb, w1, b1, w2, b2, shift, scale, gate,
                              interpret=True)
        # manual reference
        from supertonic_tpu.models.layers import layer_norm

        h = layer_norm({"g": g, "b": bb}, x)
        mid = jax.nn.silu(h @ w1 + b1)
        want = x + mid @ w2 + b2
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
