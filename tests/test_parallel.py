"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from supertonic_tpu.engine import synthesize_padded
from supertonic_tpu.models import init_all
from supertonic_tpu.parallel import (
    make_mesh,
    param_pspecs,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def params(tiny_config):
    return init_all(0, tiny_config)


def _batch_inputs(cfg, b, l, t, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 200, (b, l)).astype(np.int32)
    mask = np.ones((b, l), np.float32)
    sdp = rng.standard_normal(
        (b, cfg.dp.style.n_style, cfg.dp.style.style_value_dim)
    ).astype(np.float32)
    sttl = rng.standard_normal(
        (b, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
    ).astype(np.float32)
    noise = rng.standard_normal((b, t, cfg.latent_channels)).astype(np.float32)
    return ids, mask, sdp, sttl, noise


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_param_pspecs_layout(params):
    specs = param_pspecs(params)
    ve = specs["vector_estimator"]["blocks"][0]
    assert ve["ffn"]["in"]["w"] == P(None, "model")
    assert ve["ffn"]["out"]["w"] == P("model", None)
    assert ve["self"]["q"]["w"] == P(None, "model")
    assert ve["self"]["o"]["w"] == P("model", None)
    assert specs["vector_estimator"]["in_proj"]["w"] == P()
    assert specs["vocoder"]["pre"]["w"] == P()


def test_dp_sharded_synthesis_matches_single_device(params, tiny_config):
    """Data-parallel execution over 8 devices must produce the same waveform
    as unsharded execution."""
    cfg = tiny_config
    b, l, t = 8, 32, 16
    ids, mask, sdp, sttl, noise = _batch_inputs(cfg, b, l, t)

    def run(ids_, mask_, sdp_, sttl_, noise_, ps):
        return synthesize_padded(
            ps, cfg, ids_, mask_, sdp_, sttl_, noise_,
            jnp.float32(1.05), 2, precision="f32",
        )

    wav_ref, dur_ref = jax.jit(run, static_argnames=())(
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(sdp),
        jnp.asarray(sttl), jnp.asarray(noise), params,
    )

    mesh = make_mesh(8)
    sp = shard_params(params, mesh)
    sharded = shard_batch(mesh, ids, mask, sdp, sttl, noise)
    wav_dp, dur_dp = jax.jit(run)(*sharded, sp)
    np.testing.assert_allclose(
        np.asarray(wav_ref), np.asarray(wav_dp), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dur_ref), np.asarray(dur_dp), atol=1e-6
    )


def test_tp_sharded_synthesis_matches(params, tiny_config):
    """Tensor-parallel (2-way) + data-parallel (4-way) must match unsharded."""
    cfg = tiny_config
    b, l, t = 4, 32, 16
    ids, mask, sdp, sttl, noise = _batch_inputs(cfg, b, l, t, seed=5)

    def run(ids_, mask_, sdp_, sttl_, noise_, ps):
        return synthesize_padded(
            ps, cfg, ids_, mask_, sdp_, sttl_, noise_,
            jnp.float32(1.05), 2, precision="f32",
        )

    wav_ref, _ = jax.jit(run)(
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(sdp),
        jnp.asarray(sttl), jnp.asarray(noise), params,
    )
    mesh = make_mesh(8, model_parallel=2)
    sp = shard_params(params, mesh)
    sharded = shard_batch(mesh, ids, mask, sdp, sttl, noise)
    wav_tp, _ = jax.jit(run)(*sharded, sp)
    np.testing.assert_allclose(
        np.asarray(wav_ref), np.asarray(wav_tp), atol=5e-5
    )
