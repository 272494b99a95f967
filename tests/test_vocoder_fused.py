"""Parity tests for the Pallas fused vocoder resblock chain
(ops/vocoder_fused.py) against the XLA path (models/vocoder._resblock), in
TPU-interpret mode on CPU. The kernel's contract: identical module
semantics, the only numeric difference being in-conv summation order
(3 shifted matmuls vs XLA's conv lowering)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from supertonic_tpu.config import TTSConfig
from supertonic_tpu.models import layers as L
from supertonic_tpu.models import vocoder
from supertonic_tpu.ops import vocoder_fused as vf


def _params(rng, c, dils):
    p = {"convs": [{"a": L.conv1d_init(rng, c, c, 3),
                    "b": L.conv1d_init(rng, c, c, 3)}
                   for _ in dils]}
    return jax.tree_util.tree_map(jnp.asarray, p)


@pytest.mark.parametrize("c,t,b", [(128, 96, 2), (256, 160, 1)])
def test_fused_resblock_matches_xla(c, t, b):
    rng = np.random.default_rng(0)
    dils = (1, 3, 9)
    p = _params(rng, c, dils)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    mask = jnp.ones((1, t, 1), jnp.float32).at[0, -9:, 0].set(0.0)
    ref = vocoder._resblock(p, x, dils, mask)
    with pltpu.force_tpu_interpret_mode():
        got = vf.fused_resblock(p, x, dils, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    # masked tail frames are exactly zeroed + residual (same as XLA path)
    np.testing.assert_array_equal(np.asarray(got[:, -1]),
                                  np.asarray(ref[:, -1]))


def test_fused_resblock_no_mask_and_tiling():
    """Multi-tile grid (t > t_blk) must match single-tile output — the
    halo argument in the kernel docstring, exercised across a tile seam."""
    rng = np.random.default_rng(1)
    dils = (1, 3, 9)
    c = 128
    p = _params(rng, c, dils)
    x = jnp.asarray(rng.standard_normal((1, 200, c)), jnp.float32)
    ref = vocoder._resblock(p, x, dils, None)
    with pltpu.force_tpu_interpret_mode():
        one_tile = vf.fused_resblock(p, x, dils, None, t_blk=2048)
        four_tiles = vf.fused_resblock(p, x, dils, None, t_blk=48)
    np.testing.assert_allclose(np.asarray(one_tile), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    # seam-free: tiling must not change a single value beyond dtype noise
    np.testing.assert_allclose(np.asarray(four_tiles), np.asarray(one_tile),
                               rtol=2e-6, atol=2e-6)


def test_fused_vocoder_apply_matches_default():
    """Full vocoder.apply with TTS_VOC_FUSED semantics vs the XLA path on a
    small config: same waveform within f32 conv-order tolerance; the
    coarse 512-channel pre_res falls back to XLA inside the same apply."""
    cfg = TTSConfig()
    rng = np.random.default_rng(2)
    params = jax.tree_util.tree_map(jnp.asarray, vocoder.init(rng, cfg))
    t = 24
    lat = jnp.asarray(
        rng.standard_normal((2, t, cfg.latent_channels)), jnp.float32)
    fm = jnp.ones((t,), jnp.float32).at[-5:].set(0.0)
    ref = vocoder.apply(params, cfg, lat, frame_mask=fm,
                        fused_resblocks=False)
    with pltpu.force_tpu_interpret_mode():
        got = vocoder.apply(params, cfg, lat, frame_mask=fm,
                            fused_resblocks=True)
    # wav passes through tanh; absolute tolerance is the right scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_chain_halo_matches_receptive_field_math():
    """The kernel halo must be >= the per-chain reach used by
    vocoder.receptive_field_frames (same formula, per timeline)."""
    cfg = TTSConfig()
    hp = cfg.vocoder
    per_chain = sum(d * (hp.resblock_kernel - 1) // 2
                    + (hp.resblock_kernel - 1) // 2
                    for d in hp.resblock_dilations)
    assert vf.chain_halo(hp.resblock_kernel, hp.resblock_dilations) \
        == per_chain


def test_up_matmul_matches_conv_path():
    """vocoder.apply(up_matmul=True) — each upsample conv lowered as one
    K-stacked matmul (TTS_VOC_UP_MATMUL) — must match the conv path to
    K-sum-order tolerance, including bucket-pad masking semantics.
    (Measured neutral on the TPU and default-off; the flag stays because
    the layout analysis in docs/PERFORMANCE.md is anchored on it.)"""
    cfg = TTSConfig()
    rng = np.random.default_rng(3)
    params = jax.tree_util.tree_map(jnp.asarray, vocoder.init(rng, cfg))
    t = 24
    lat = jnp.asarray(
        rng.standard_normal((2, t, cfg.latent_channels)), jnp.float32)
    fm = jnp.ones((t,), jnp.float32).at[-5:].set(0.0)
    ref = vocoder.apply(params, cfg, lat, frame_mask=fm, up_matmul=False)
    got = vocoder.apply(params, cfg, lat, frame_mask=fm, up_matmul=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
