"""Validate the analytic FLOP model (bench/flops.py) against XLA's own
``cost_analysis()`` per stage (CPU backend exposes 'flops' on compiled
executables). The analytic model counts matmul/conv/attention MACs only, so
it must land within a modeling band of XLA's count — [0.6, 1.1]x — rather
than exactly (XLA also counts element-wise ops, and fuses some away).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from supertonic_tpu.bench import flops as F
from supertonic_tpu.models import (duration_predictor, init_all, text_encoder,
                                   vector_estimator, vocoder)

B, L, T, STEPS = 2, 24, 16, 3


@pytest.fixture(scope="module")
def setup(tiny_config):
    return tiny_config, init_all(0, tiny_config)


def _xla_flops(fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    val = float(ca.get("flops", 0.0))
    assert val > 0, "backend exposed no flops"
    return val


def _band(analytic, xla):
    ratio = analytic / xla
    assert 0.6 <= ratio <= 1.1, (
        f"analytic {analytic:.3e} vs XLA {xla:.3e} (ratio {ratio:.3f})")


def test_duration_predictor_flops(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 200, (B, L)), jnp.int32)
    sdp = jnp.asarray(rng.standard_normal(
        (B, cfg.dp.style.n_style, cfg.dp.style.style_value_dim)), jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    xla = _xla_flops(
        lambda i, s, m: duration_predictor.apply(
            params["duration_predictor"], cfg, i, s, m), ids, sdp, mask)
    _band(B * F.duration_predictor_flops(cfg, L), xla)


def test_text_encoder_flops(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 200, (B, L)), jnp.int32)
    sttl = jnp.asarray(rng.standard_normal(
        (B, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)),
        jnp.float32)
    mask = jnp.ones((B, L), jnp.float32)
    xla = _xla_flops(
        lambda i, s, m: text_encoder.apply(
            params["text_encoder"], cfg, i, s, m), ids, sttl, mask)
    _band(B * F.text_encoder_flops(cfg, L), xla)


def test_vector_estimator_step_flops(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.latent_channels)),
                    jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, L, cfg.ttl.proj_out_odim)),
                      jnp.float32)
    sttl = jnp.asarray(rng.standard_normal(
        (B, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)),
        jnp.float32)
    tmask = jnp.ones((B, L), jnp.float32)
    lmask = jnp.ones((B, T), jnp.float32)
    cur = jnp.zeros((B,), jnp.float32)
    tot = jnp.full((B,), float(STEPS), jnp.float32)
    xla = _xla_flops(
        lambda *a: vector_estimator.step(
            params["vector_estimator"], cfg, *a),
        x, emb, sttl, tmask, lmask, cur, tot)
    # one un-hoisted step == per-step + hoisted terms, i.e. the model at
    # total_step=1
    _band(B * F.vector_estimator_flops(cfg, L, T, 1), xla)


def test_vocoder_flops(setup):
    cfg, params = setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, cfg.latent_channels)),
                    jnp.float32)
    xla = _xla_flops(lambda a: vocoder.apply(params["vocoder"], cfg, a), x)
    _band(B * F.vocoder_flops(cfg, T), xla)


def test_fused_total_is_sum_of_stages(setup):
    cfg, _ = setup
    total = F.fused_synthesis_flops(cfg, B, L, T, STEPS)
    per_row = (F.duration_predictor_flops(cfg, L)
               + F.text_encoder_flops(cfg, L)
               + F.vector_estimator_flops(cfg, L, T, STEPS)
               + F.vocoder_flops(cfg, T))
    assert total == B * per_row
    # flow loop dominates and scales with steps (hoisted KV does not)
    t5 = F.vector_estimator_flops(cfg, L, T, 5)
    t1 = F.vector_estimator_flops(cfg, L, T, 1)
    assert t5 < 5 * t1  # hoisting means sublinear growth
    assert t5 > 4 * (t1 - (t5 - t1) / 4)


def test_mfu_helper():
    tflops, frac = F.mfu(197e12 * 0.5, 1.0, "v5e", 1)
    assert abs(tflops - 98.5) < 1e-6
    assert abs(frac - 0.5) < 1e-9
