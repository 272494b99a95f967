"""Neural vocoder: latent frames -> waveform.

I/O contract (reference SURVEY.md §2.2; cpp/helper.cpp:663-664,
go/helper.go:891-892):
    input  : latent f32 [B, C, T]  (C = latent_dim * ccf)
    output : wav_tts f32 [B, T * chunk_size]
The output covers full latent frames — i.e. it is PADDED past the true
duration; consumers trim to int(sample_rate * duration[b]) (reference
py/example_onnx.py:113, py/service.py:63-71).

TPU-first design ("coarse-timeline subpixel" vocoder):

  * Every upsampling stage is a conv1d producing C_out*factor channels
    followed by depth-to-space — a pure matmul + reshape that maps straight
    onto the MXU (literal transposed convolution scatters; fine on the
    reference's CPU ONNX path, hostile on TPU).
  * Convolutions NEVER run at the audio sample rate. XLA lowers low-channel
    convs on huge timelines via materialized im2col patches (measured:
    6.5 GB HBM temp per 8 utterances with a conventional to-the-sample
    stack). Instead the conv trunk stops at timeline T * prod(factors) with
    >=128 lane-friendly channels, and the last `final_depth =
    chunk_size / prod(factors)` samples-per-step are emitted by one
    subpixel projection (k-tap conv as matmul) + reshape.
  * Dilated residual blocks provide the receptive field at each (coarse)
    timeline (HiFi-GAN-family design, sized for the 66 M budget).

Internal layout [B, T, C].
"""

from __future__ import annotations

import math

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


def _resblock(p: L.Params, x: jax.Array, dilations,
              mask: jax.Array | None = None) -> jax.Array:
    for cp, d in zip(p["convs"], dilations):
        h = L.conv1d(cp["a"], jax.nn.silu(x), dilation=d)
        if mask is not None:
            # re-zero pad frames after EVERY conv: a conv bias makes padded
            # positions nonzero, and the next conv would bleed that halo
            # back into the valid tail — masking keeps bucket-padded
            # execution bit-identical to exact-length execution
            h = h * mask
        h = L.conv1d(cp["b"], jax.nn.silu(h))
        if mask is not None:
            h = h * mask
        x = x + h
    return x


def final_depth(cfg: TTSConfig) -> int:
    """Samples emitted per finest-timeline step by the subpixel head."""
    return cfg.chunk_size // math.prod(cfg.vocoder.upsample_factors)


def receptive_field_frames(cfg: TTSConfig) -> int:
    """One-sided receptive field of the whole conv stack, in LATENT frames
    (ceil). A window vocoded with >= this many halo frames on each side
    produces BIT-IDENTICAL interior samples to full-sequence vocoding —
    the guarantee behind sub-chunk streaming (engine.stream windows)."""
    from fractions import Fraction

    hp = cfg.vocoder

    def half(k: int, d: int = 1) -> int:
        return d * (k - 1) // 2

    def res_reach() -> int:
        return sum(half(hp.resblock_kernel, d) + half(hp.resblock_kernel)
                   for d in hp.resblock_dilations)

    r = Fraction(half(7) + res_reach())  # pre conv + pre_res at T
    prod = 1
    for f in hp.upsample_factors:
        r += Fraction(half(hp.stage_kernel), prod)  # up conv (pre-d2s)
        prod *= f
        r += Fraction(res_reach(), prod)
    r += Fraction(half(3), prod)  # subpixel head
    return math.ceil(r)


def init(rng, cfg: TTSConfig) -> L.Params:
    hp = cfg.vocoder
    c_lat = cfg.latent_channels
    stages = []
    cin = hp.dim
    pre = L.conv1d_init(rng, c_lat, hp.dim, 7)
    pre_res = _resblock_init(rng, hp.dim, hp.resblock_kernel,
                             hp.resblock_dilations)
    for factor, cout in zip(hp.upsample_factors, hp.channels):
        stages.append({
            "up": L.conv1d_init(rng, cin, cout * factor, hp.stage_kernel),
            "res": _resblock_init(rng, cout, hp.resblock_kernel,
                                  hp.resblock_dilations),
        })
        cin = cout
    return {
        "pre": pre,
        "pre_res": pre_res,
        "stages": stages,
        # subpixel head: k-tap conv emitting final_depth samples per step
        "head": L.conv1d_init(rng, cin, final_depth(cfg), 3),
    }


def apply(
    params: L.Params,
    cfg: TTSConfig,
    latent: jax.Array,  # [B, T, C] (engine-owned layout)
    *,
    frame_mask: jax.Array | None = None,  # [T] or [B, T]: 1 = real frame
    dtype=jnp.float32,
    fused_resblocks: bool | None = None,
    up_matmul: bool | None = None,
) -> jax.Array:
    """Returns wav [B, T * chunk_size] float32.

    ``frame_mask`` marks BATCH-MAX-valid frames (frames past the longest
    utterance in the batch, i.e. bucket padding). With it, bucket-padded
    execution is bit-identical to exact-length execution: conv biases make
    padded frames nonzero and dilated resblocks would otherwise bleed that
    halo ~receptive-field frames back into the valid tail. Per-ROW padding
    (shorter rows inside the batch max) is deliberately NOT masked — the
    reference vocoder graph is mask-free (§2.2) and runs at batch-max
    length, so its per-row halo is part of the reference semantics.

    ``fused_resblocks`` (default: the TTS_VOC_FUSED env flag, read at trace
    time): run the fine-timeline resblock chains through the Pallas fused
    kernel (ops/vocoder_fused.py) — one HBM read+write over the activation
    per chain instead of one per conv. Only chains with a shared-across-
    batch frame mask and VMEM-resident weights (C <= 384) fuse; others
    (the coarse pre_res at C=512, per-row masks) keep the XLA path.

    ``up_matmul`` (default: the TTS_VOC_UP_MATMUL env flag): lower each
    upsample conv as ONE K-stacked matmul ([B,T,k*Cin] @ [k*Cin, Cout*f])
    instead of conv_general_dilated. Numerically identical modulo K-sum
    order. Why: XLA's conv kernels emit a batch-minor {2,0,1} layout, and
    the depth-to-space reshape that follows then needs a full relayout
    copy of the largest activation in the model (measured 1.65 ms/iter of
    the 14.5 ms b64/T256 vocoder — tools/xplane_summary.py on the device
    trace); a dot emits row-major, making the reshape a free bitcast. The
    k-stacked operand costs one extra fused concat write, which the trace
    shows is cheaper than the relayout it removes."""
    import os

    hp = cfg.vocoder
    if fused_resblocks is None:
        fused_resblocks = os.environ.get("TTS_VOC_FUSED", "0") == "1"
    if up_matmul is None:
        up_matmul = os.environ.get("TTS_VOC_UP_MATMUL", "0") == "1"

    def res(p, x, m):
        if (fused_resblocks and x.shape[-1] <= 384
                and (m is None or m.shape[0] == 1)):
            from ..ops import vocoder_fused

            return vocoder_fused.fused_resblock(
                p, x, hp.resblock_dilations, m)
        return _resblock(p, x, hp.resblock_dilations, m)

    m = None
    if frame_mask is not None:
        m = frame_mask.astype(dtype)
        m = m[None, :, None] if m.ndim == 1 else m[:, :, None]
    x = L.conv1d(params["pre"], latent.astype(dtype))
    if m is not None:
        x = x * m
    x = res(params["pre_res"], x, m)
    for sp, factor in zip(params["stages"], hp.upsample_factors):
        if up_matmul:
            w = jnp.asarray(sp["up"]["w"])               # [k, cin, cout*f]
            k = w.shape[0]
            half = (k - 1) // 2
            s = jax.nn.silu(x)
            s = jnp.pad(s, ((0, 0), (half, k - 1 - half), (0, 0)))
            t_len = x.shape[1]
            xk = jnp.concatenate(
                [s[:, i:i + t_len] for i in range(k)], axis=-1)
            h = jnp.matmul(
                xk, w.reshape(-1, w.shape[-1]).astype(x.dtype),
                preferred_element_type=jnp.float32)
            h = (h + sp["up"]["b"]).astype(x.dtype)
        else:
            h = L.conv1d(sp["up"], jax.nn.silu(x))      # [B, T, cout*factor]
        b, t, cf = h.shape
        x = h.reshape(b, t * factor, cf // factor)       # depth-to-space
        if m is not None:
            m = jnp.repeat(m, factor, axis=1)
            x = x * m
        x = res(sp["res"], x, m)
    wav = L.conv1d(params["head"], jax.nn.silu(x))       # [B, Tf, final_depth]
    b, tf, d = wav.shape
    return jnp.tanh(wav.astype(jnp.float32).reshape(b, tf * d))
