"""Neural vocoder: latent frames -> waveform.

I/O contract (reference SURVEY.md §2.2; cpp/helper.cpp:663-664,
go/helper.go:891-892):
    input  : latent f32 [B, C, T]  (C = latent_dim * ccf)
    output : wav_tts f32 [B, T * chunk_size]
The output covers full latent frames — i.e. it is PADDED past the true
duration; consumers trim to int(sample_rate * duration[b]) (reference
py/example_onnx.py:113, py/service.py:63-71).

TPU-first design: every upsampling stage is a conv1d producing
``C_out * factor`` channels followed by depth-to-space — a pure matmul +
reshape, which maps straight onto the MXU, unlike literal transposed
convolution (the reference's ONNX graph runs on CPU and can afford
scatter-style conv-transpose; on TPU sub-pixel conv is the speed-of-light
formulation). Dilated residual blocks after each stage provide the receptive
field (HiFi-GAN-family design, sized for the 66 M budget).
Internal layout [B, T, C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from . import layers as L


def _resblock_init(rng, ch: int, kernel: int, dilations) -> L.Params:
    return {
        "convs": [
            {
                "a": L.conv1d_init(rng, ch, ch, kernel),
                "b": L.conv1d_init(rng, ch, ch, kernel),
            }
            for _ in range(len(dilations))
        ],
    }


def _resblock(p: L.Params, x: jax.Array, dilations) -> jax.Array:
    for cp, d in zip(p["convs"], dilations):
        h = L.conv1d(cp["a"], jax.nn.silu(x), dilation=d)
        h = L.conv1d(cp["b"], jax.nn.silu(h))
        x = x + h
    return x


def init(rng, cfg: TTSConfig) -> L.Params:
    hp = cfg.vocoder
    c_lat = cfg.latent_channels
    stages = []
    cin = hp.dim
    pre = L.conv1d_init(rng, c_lat, hp.dim, 7)
    for factor, cout in zip(hp.upsample_factors, hp.channels):
        stages.append({
            "up": L.conv1d_init(rng, cin, cout * factor, hp.stage_kernel),
            "res": _resblock_init(rng, cout, hp.resblock_kernel,
                                  hp.resblock_dilations),
        })
        cin = cout
    return {
        "pre": pre,
        "stages": stages,
        "post": L.conv1d_init(rng, cin, 1, 7),
    }


def apply(
    params: L.Params,
    cfg: TTSConfig,
    latent: jax.Array,  # [B, T, C] (engine-owned layout)
    *,
    dtype=jnp.float32,
) -> jax.Array:
    """Returns wav [B, T * chunk_size] float32."""
    hp = cfg.vocoder
    x = L.conv1d(params["pre"], latent.astype(dtype))
    for sp, factor in zip(params["stages"], hp.upsample_factors):
        h = L.conv1d(sp["up"], jax.nn.silu(x))         # [B, T, cout*factor]
        b, t, cf = h.shape
        x = h.reshape(b, t * factor, cf // factor)      # depth-to-space
        x = _resblock(sp["res"], x, hp.resblock_dilations)
    wav = L.conv1d(params["post"], jax.nn.silu(x))[..., 0]
    return jnp.tanh(wav.astype(jnp.float32))
