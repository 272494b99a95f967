"""Shape/semantics tests for the four networks (contract per SURVEY.md §2.2).

All applies go through jax.jit: on this host each *eager* primitive dispatch
costs a ~0.65 s XLA-CPU compile, while a whole-model jit is ~1 s total and is
persisted by the compilation cache (see conftest.py).
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
from supertonic_tpu.models.layers import count_params


@pytest.fixture(scope="module")
def params(tiny_config):
    return init_all(0, tiny_config)


@pytest.fixture(scope="module")
def fns(params, tiny_config):
    cfg = tiny_config

    @jax.jit
    def dp(ids, style, mask):
        return duration_predictor.apply(
            params["duration_predictor"], cfg, ids, style, mask
        )

    @jax.jit
    def te(ids, style, mask):
        return text_encoder.apply(params["text_encoder"], cfg, ids, style, mask)

    @jax.jit
    def ve(latent, emb, style, tmask, lmask, cur, tot):
        return vector_estimator.step(
            params["vector_estimator"], cfg, latent, emb, style, tmask, lmask,
            cur, tot,
        )

    @jax.jit
    def voc(latent):
        return vocoder.apply(params["vocoder"], cfg, latent)

    return {"dp": dp, "te": te, "ve": ve, "voc": voc}


def _inputs(tiny_config, b=2, l=16, t=12, seed=0):
    rng = np.random.default_rng(seed)
    cfg = tiny_config
    s, d = cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim
    text_ids = jnp.asarray(rng.integers(1, 200, (b, l)))
    text_mask = jnp.asarray(
        (np.arange(l)[None, :] < np.array([[l], [l - 5]])).astype(np.float32)
    )
    style = jnp.asarray(rng.standard_normal((b, s, d)), dtype=jnp.float32)
    latent = jnp.asarray(
        rng.standard_normal((b, t, cfg.latent_channels)), dtype=jnp.float32
    )
    latent_mask = jnp.asarray(
        (np.arange(t)[None, :] < np.array([[t], [t - 4]])).astype(np.float32)
    )
    return text_ids, text_mask, style, latent, latent_mask


class TestDurationPredictor:
    def test_output_shape_and_positive(self, fns, tiny_config):
        text_ids, text_mask, style, *_ = _inputs(tiny_config)
        dur = fns["dp"](text_ids, style, text_mask)
        assert dur.shape == (2,)
        assert (np.asarray(dur) > 0).all()

    def test_padding_invariance(self, fns, tiny_config):
        """Extending the pad region must not change the prediction."""
        text_ids, text_mask, style, *_ = _inputs(tiny_config)
        dur1 = fns["dp"](text_ids, style, text_mask)
        ids2 = jnp.pad(text_ids, ((0, 0), (0, 8)))
        mask2 = jnp.pad(text_mask, ((0, 0), (0, 8)))
        dur2 = fns["dp"](ids2, style, mask2)
        np.testing.assert_allclose(np.asarray(dur1), np.asarray(dur2), atol=1e-5)


class TestTextEncoder:
    def test_output_shape(self, fns, tiny_config):
        text_ids, text_mask, style, *_ = _inputs(tiny_config)
        emb = fns["te"](text_ids, style, text_mask)
        assert emb.shape == (2, 16, tiny_config.ttl.proj_out_odim)

    def test_masked_positions_zero(self, fns, tiny_config):
        text_ids, text_mask, style, *_ = _inputs(tiny_config)
        emb = np.asarray(fns["te"](text_ids, style, text_mask))
        assert np.abs(emb[1, -5:]).max() == 0.0

    def test_padding_invariance(self, fns, tiny_config):
        text_ids, text_mask, style, *_ = _inputs(tiny_config)
        emb1 = fns["te"](text_ids, style, text_mask)
        ids2 = jnp.pad(text_ids, ((0, 0), (0, 8)))
        mask2 = jnp.pad(text_mask, ((0, 0), (0, 8)))
        emb2 = fns["te"](ids2, style, mask2)
        np.testing.assert_allclose(
            np.asarray(emb1), np.asarray(emb2)[:, :16], atol=2e-5
        )


class TestVectorEstimator:
    def test_step_preserves_shape_and_mask(self, fns, tiny_config):
        text_ids, text_mask, style, latent, latent_mask = _inputs(tiny_config)
        emb = fns["te"](text_ids, style, text_mask)
        out = fns["ve"](latent, emb, style, text_mask, latent_mask,
                        jnp.zeros((2,)), jnp.full((2,), 4.0))
        assert out.shape == latent.shape
        assert np.abs(np.asarray(out)[1, -4:]).max() == 0.0  # masked frames zero

    def test_zero_init_means_first_step_identity_in_mask(self, fns, tiny_config):
        """out_proj is zero-init, so a freshly initialized flow step returns
        x unchanged inside the mask (Euler update with v=0)."""
        text_ids, text_mask, style, latent, latent_mask = _inputs(tiny_config)
        latent = latent * latent_mask[:, :, None]
        emb = fns["te"](text_ids, style, text_mask)
        out = fns["ve"](latent, emb, style, text_mask, latent_mask,
                        jnp.zeros((2,)), jnp.full((2,), 4.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(latent), atol=1e-6)

    def test_steps_differ_over_time(self, params, fns, tiny_config):
        # perturb the zero-init heads (out_proj AND the final AdaLN, which is
        # where time conditioning enters) so the velocity depends on t
        rng = np.random.default_rng(1)

        def _randomize(p):
            return {
                "w": (rng.standard_normal(p["w"].shape) * 0.1).astype(np.float32),
                "b": p["b"],
            }

        base = params["vector_estimator"]
        p2 = {**base,
              "out_proj": _randomize(base["out_proj"]),
              "adaln_out": _randomize(base["adaln_out"])}

        @jax.jit
        def ve2(latent, emb, style, tmask, lmask, cur, tot):
            return vector_estimator.step(
                p2, tiny_config, latent, emb, style, tmask, lmask, cur, tot
            )

        text_ids, text_mask, style, latent, latent_mask = _inputs(tiny_config)
        emb = fns["te"](text_ids, style, text_mask)
        tot = jnp.full((2,), 4.0)
        o0 = ve2(latent, emb, style, text_mask, latent_mask, jnp.zeros((2,)), tot)
        o1 = ve2(latent, emb, style, text_mask, latent_mask, jnp.ones((2,)), tot)
        assert np.abs(np.asarray(o0) - np.asarray(o1)).max() > 1e-6


class TestVocoder:
    def test_upsample_geometry(self, fns, tiny_config):
        *_, latent, _ = _inputs(tiny_config)
        wav = fns["voc"](latent)
        assert wav.shape == (2, 12 * tiny_config.chunk_size)
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_chunk_size_matches_reference_geometry(self, tiny_config):
        # T_lat * chunk_size >= sample_rate * duration always holds with
        # T_lat = ceil(dur * sr / chunk) (reference py/helper.py:165-168)
        dur, sr, chunk = 1.7, tiny_config.sample_rate, tiny_config.chunk_size
        t_lat = -(-int(dur * sr) // chunk)
        assert t_lat * chunk >= dur * sr


def test_param_count_default_config_near_66m():
    """Reference model is 66 M params (README.md:60); our default config must
    land in the same ballpark so compute cost is comparable."""
    from supertonic_tpu.config import TTSConfig

    cfg = TTSConfig()
    params = init_all(0, cfg)
    n = count_params(params)
    assert 40e6 < n < 90e6, f"param count {n/1e6:.1f}M out of range"


def test_fused_projections_parity(tiny_config):
    """fuse_projections must be a pure refactor: identical outputs."""
    from supertonic_tpu.models import fuse_projections

    params = init_all(0, tiny_config)
    fused = fuse_projections(params)
    rng = np.random.default_rng(0)
    b, l = 2, 16
    ids = jnp.asarray(rng.integers(1, 200, (b, l)))
    mask = jnp.ones((b, l), jnp.float32)
    style = jnp.asarray(rng.standard_normal(
        (b, tiny_config.ttl.style.n_style, tiny_config.ttl.style.style_value_dim)
    ), jnp.float32)

    ref = jax.jit(lambda: text_encoder.apply(
        params["text_encoder"], tiny_config, ids, style, mask))()
    got = jax.jit(lambda: text_encoder.apply(
        fused["text_encoder"], tiny_config, ids, style, mask))()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    dref = jax.jit(lambda: duration_predictor.apply(
        params["duration_predictor"], tiny_config, ids, style, mask))()
    dgot = jax.jit(lambda: duration_predictor.apply(
        fused["duration_predictor"], tiny_config, ids, style, mask))()
    np.testing.assert_allclose(np.asarray(dgot), np.asarray(dref), atol=1e-6)


def test_kt_cache_matches_standard_layout(tiny_config, rng, monkeypatch):
    """TTS_KT_CACHE=1 (transposed cross-K cache) must produce the same
    velocity field as the standard layout — same math, different operand
    layout for the logits matmul (layers.kv_project transposed arm)."""
    import jax.numpy as jnp

    from supertonic_tpu.models import init_all, layers as L, vector_estimator

    cfg = tiny_config
    params = init_all(0, cfg)["vector_estimator"]
    hp = cfg.vector_estimator
    b, T, Lt = 2, 8, 6
    lat = rng.standard_normal((b, T, cfg.latent_channels)).astype("float32")
    emb = rng.standard_normal((b, Lt, cfg.ttl.proj_out_odim)).astype("float32")
    st = rng.standard_normal(
        (b, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
    ).astype("float32")
    tmask = jnp.ones((b, Lt), jnp.float32)
    lmask = jnp.ones((b, T), jnp.float32)
    t = jnp.full((b,), 0.3, jnp.float32)

    def run():
        return vector_estimator.velocity(
            params, cfg, jnp.asarray(lat), jnp.asarray(emb), jnp.asarray(st),
            tmask, lmask, t)

    monkeypatch.delenv("TTS_KT_CACHE", raising=False)
    ref = run()
    monkeypatch.setenv("TTS_KT_CACHE", "1")
    assert L.kt_cache_enabled()
    got = run()
    import numpy as np

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # custom attn_fn keeps the standard contract: flag must be ignored
    got2 = vector_estimator.velocity(
        params, cfg, jnp.asarray(lat), jnp.asarray(emb), jnp.asarray(st),
        tmask, lmask, t,
        attn_fn=lambda q, k, v, m: L.attention_core(q, k, v, m))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
