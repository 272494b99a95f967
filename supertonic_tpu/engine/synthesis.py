"""Jit-compiled synthesis stages.

The reference host loop (py/helper.py:177-215) crosses the Python↔ONNX
boundary 3 + total_step times per chunk. TPU-first redesign: TWO compiled
programs with a single tiny host transfer between them.

  Stage A  (text):     text_ids, masks, styles -> duration [B], text_emb
  [host: duration -> wav lengths -> latent bucket choice -> noise shapes]
  Stage B  (acoustic): text_emb, styles, masks, noise -> waveform

The flow-matching Euler loop runs as ``lax.fori_loop`` INSIDE stage B — zero
host round-trips in the hot loop (the reference pays one ORT call per step,
py/helper.py:200-213). Stage B ends with the vocoder, so the only transfer
out is the waveform itself (BASELINE "gather at egress only").

Shapes are static per (B, L, T, total_step) bucket; the engine caches the
compiled executables per bucket.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from ..models import duration_predictor, text_encoder, vector_estimator, vocoder
from ..models import layers as L


def _dtype_of(precision: str):
    # "int8" quantizes the estimator-block matmuls (params carry w_q, see
    # models.quantize_params); everything else in that mode computes in bf16.
    return jnp.float32 if precision == "f32" else jnp.bfloat16


def text_stage(
    params: dict,
    cfg: TTSConfig,
    text_ids: jax.Array,    # [B, L] int32
    text_mask: jax.Array,   # [B, L] f32
    style_dp: jax.Array,    # [B, S_dp, D_dp]
    style_ttl: jax.Array,   # [B, S, D]
    speed: jax.Array,       # scalar f32
    *,
    precision: str = "bf16",
    attn_fn=L.attention_core,
) -> tuple[jax.Array, jax.Array]:
    """Duration prediction + text encoding. Returns (duration [B] f32 seconds
    — already divided by speed, reference py/helper.py:193 — and text_emb)."""
    dtype = _dtype_of(precision)
    dur = duration_predictor.apply(
        params["duration_predictor"], cfg, text_ids, style_dp, text_mask,
        dtype=dtype, attn_fn=attn_fn,
    )
    dur = dur / speed
    emb = text_encoder.apply(
        params["text_encoder"], cfg, text_ids, style_ttl, text_mask,
        dtype=dtype, attn_fn=attn_fn,
    )
    return dur, emb


def acoustic_stage(
    params: dict,
    cfg: TTSConfig,
    text_emb: jax.Array,     # [B, L, odim]
    style_ttl: jax.Array,    # [B, S, D]
    text_mask: jax.Array,    # [B, L]
    latent_mask: jax.Array,  # [B, T]
    noise: jax.Array,        # [B, T, C] ~ N(0,1) (pre-mask)
    total_step: int,         # STATIC loop bound
    *,
    precision: str = "bf16",
    attn_fn=L.attention_core,
    fused_ffn: bool = False,
) -> jax.Array:
    """Flow-matching Euler loop + vocoder. Returns wav [B, T*chunk] f32.

    Per-sample semantics identical to the reference (§2.2): initial latent =
    noise * latent_mask (py/helper.py:170-174), each step feeds x_t with
    (current_step, total_step) into the estimator which applies the Euler
    update internally.
    """
    dtype = _dtype_of(precision)
    b = text_emb.shape[0]
    x0 = noise.astype(jnp.float32) * latent_mask[:, :, None]
    tot = jnp.full((b,), float(total_step), jnp.float32)

    # NOTE: explicitly hoisting the cross-attention K/V out of the loop
    # (vector_estimator.precompute_cross) was measured SLOWER on TPU
    # (96->106 ms at b64/5-step): XLA's while-loop LICM already hoists the
    # invariant projections, and forcing ~96 MB of per-block K/V into the
    # loop carry added async-copy traffic. The cache API stays opt-in for
    # step-at-a-time callers (infer_with_progress) where each step is a
    # separate program and XLA cannot hoist across dispatches.
    def body(step, x):
        cur = jnp.full((b,), 1.0, jnp.float32) * step
        return vector_estimator.step(
            params["vector_estimator"], cfg, x, text_emb, style_ttl,
            text_mask, latent_mask, cur, tot, dtype=dtype, attn_fn=attn_fn,
            fused_ffn=fused_ffn,
        )

    xt = jax.lax.fori_loop(0, total_step, body, x0)
    # batch-max frame validity: frames past the longest utterance are
    # bucket padding; masking them inside the vocoder keeps bucketed
    # output bit-identical to exact-length execution (models/vocoder.py)
    frame_mask = jnp.max(latent_mask, axis=0)
    return vocoder.apply(params["vocoder"], cfg, xt, frame_mask=frame_mask,
                         dtype=dtype)


def flow_stage(
    params: dict,
    cfg: TTSConfig,
    text_emb: jax.Array,
    style_ttl: jax.Array,
    text_mask: jax.Array,
    latent_mask: jax.Array,
    noise: jax.Array,
    total_step: int,
    *,
    precision: str = "bf16",
    attn_fn=L.attention_core,
    fused_ffn: bool = False,
) -> jax.Array:
    """acoustic_stage WITHOUT the vocoder: returns the denoised latent
    [B, T, C] (device-resident) — the input to windowed vocoding."""
    dtype = _dtype_of(precision)
    b = text_emb.shape[0]
    x0 = noise.astype(jnp.float32) * latent_mask[:, :, None]
    tot = jnp.full((b,), float(total_step), jnp.float32)

    def body(step, x):
        cur = jnp.full((b,), 1.0, jnp.float32) * step
        return vector_estimator.step(
            params["vector_estimator"], cfg, x, text_emb, style_ttl,
            text_mask, latent_mask, cur, tot, dtype=dtype, attn_fn=attn_fn,
            fused_ffn=fused_ffn,
        )

    return jax.lax.fori_loop(0, total_step, body, x0)


def flow_fused(
    params: dict,
    cfg: TTSConfig,
    text_ids: jax.Array,
    text_mask: jax.Array,
    style_dp: jax.Array,
    style_ttl: jax.Array,
    key: jax.Array,
    speed: jax.Array,
    total_step: int,   # STATIC
    t_pad: int,        # STATIC latent bucket
    *,
    precision: str = "bf16",
    attn_fn=L.attention_core,
    fused_ffn: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """synthesize_fused WITHOUT the vocoder: text stage + on-device noise +
    flow loop in ONE program with ZERO host syncs. Returns (latent
    [B, t_pad, C], duration [B] — UNCLAMPED for overflow detection —, and
    the batch-max frame mask [t_pad]). Feeds windowed vocoding
    (vocode_window): streaming callers fetch duration TOGETHER with the
    first vocoded window in a single device round-trip."""
    dur, emb = text_stage(
        params, cfg, text_ids, text_mask, style_dp, style_ttl, speed,
        precision=precision, attn_fn=attn_fn,
    )
    chunk = cfg.chunk_size
    latent_len = jnp.minimum(
        jnp.ceil(dur * cfg.sample_rate / chunk), float(t_pad))
    frame_idx = jnp.arange(t_pad, dtype=jnp.float32)[None, :]
    latent_mask = (frame_idx < latent_len[:, None]).astype(jnp.float32)
    b = text_ids.shape[0]
    noise = jax.random.normal(key, (b, t_pad, cfg.latent_channels),
                              jnp.float32)
    xt = flow_stage(params, cfg, emb, style_ttl, text_mask, latent_mask,
                    noise, total_step, precision=precision, attn_fn=attn_fn,
                    fused_ffn=fused_ffn)
    return xt, dur, jnp.max(latent_mask, axis=0)


def jit_flow_fused(cfg: TTSConfig, *, precision="bf16",
                   attn_fn=None, fused_ffn=False) -> Callable:
    fn = functools.partial(flow_fused, precision=precision,
                           attn_fn=attn_fn or L.attention_core,
                           fused_ffn=fused_ffn)

    def closed(params, ids, mask, sdp, sttl, key, speed, total_step, t_pad):
        return fn(params, cfg, ids, mask, sdp, sttl, key, speed,
                  total_step, t_pad)

    return jax.jit(closed, static_argnums=(7, 8))


def vocode_window(
    params: dict,
    cfg: TTSConfig,
    xt_pad: jax.Array,       # [B, T+2H, C]: latent pre-padded with H zero
                             # frames each side
    mask_pad: jax.Array,     # [T+2H] batch-max frame mask, zero in the pads
    start: jax.Array,        # scalar int32: window start in PADDED frames
    window: int,             # STATIC: emitted frames per window
    halo: int,               # STATIC: >= vocoder.receptive_field_frames(cfg)
    *,
    precision: str = "bf16",
    egress: str = "int16",
) -> jax.Array:
    """Vocode ONE window of `window` frames with `halo` context frames each
    side and return only the interior samples [B, window*chunk]. With
    halo >= the conv stack's receptive field the interior is bit-identical
    to full-sequence vocoding (models/vocoder.py receptive_field_frames) —
    audio can stream before the full chunk vocodes (BASELINE TTFA)."""
    b = xt_pad.shape[0]
    span = window + 2 * halo
    win = jax.lax.dynamic_slice(
        xt_pad, (0, start, 0), (b, span, xt_pad.shape[2]))
    mwin = jax.lax.dynamic_slice(mask_pad, (start,), (span,))
    wav = vocoder.apply(params["vocoder"], cfg, win, frame_mask=mwin,
                        dtype=_dtype_of(precision))
    chunk = cfg.chunk_size
    wav = wav[:, halo * chunk: (halo + window) * chunk]
    if egress == "int16":
        wav = jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
    elif egress == "mulaw":
        wav = _mulaw_encode(wav)
    return wav


def synthesize_padded(
    params: dict,
    cfg: TTSConfig,
    text_ids: jax.Array,
    text_mask: jax.Array,
    style_dp: jax.Array,
    style_ttl: jax.Array,
    noise: jax.Array,        # [B, T, C]
    speed: jax.Array,
    total_step: int,
    *,
    precision: str = "bf16",
    attn_fn=L.attention_core,
) -> tuple[jax.Array, jax.Array]:
    """Single fully-jittable end-to-end program with a FIXED latent length
    (noise carries the T dim). The latent mask is derived on-device from the
    predicted duration (reference geometry py/helper.py:161-175). Used by the
    driver entry point and the fixed-shape serving fast path; the engine's
    two-stage path picks T adaptively instead.

    Returns (wav [B, T*chunk] f32, duration [B] f32 seconds).
    """
    dur, emb = text_stage(
        params, cfg, text_ids, text_mask, style_dp, style_ttl, speed,
        precision=precision, attn_fn=attn_fn,
    )
    t_pad = noise.shape[1]
    chunk = cfg.chunk_size
    wav_len = dur * cfg.sample_rate
    latent_len = jnp.ceil(wav_len / chunk)
    # clamp into the padded window
    latent_len = jnp.minimum(latent_len, float(t_pad))
    frame_idx = jnp.arange(t_pad, dtype=jnp.float32)[None, :]
    latent_mask = (frame_idx < latent_len[:, None]).astype(jnp.float32)
    wav = acoustic_stage(
        params, cfg, emb, style_ttl, text_mask, latent_mask, noise,
        total_step, precision=precision, attn_fn=attn_fn,
    )
    return wav, dur


def synthesize_fused(
    params: dict,
    cfg: TTSConfig,
    text_ids: jax.Array,
    text_mask: jax.Array,
    style_dp: jax.Array,
    style_ttl: jax.Array,
    key: jax.Array,          # PRNG key — noise is generated ON DEVICE
    speed: jax.Array,
    total_step: int,         # STATIC
    t_pad: int,              # STATIC latent bucket
    *,
    precision: str = "bf16",
    egress: str = "int16",   # STATIC: "int16" halves egress bytes (the WAV
                             # target format anyway); "f32" for parity
    attn_fn=L.attention_core,
    fused_ffn: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The production path: ONE compiled program, ZERO mid-pipeline host
    syncs. The reference crosses the host boundary 3 + total_step times per
    chunk (py/helper.py:177-215); the two-stage path above still crosses once
    (duration -> latent sizing). Here the latent mask is derived on device
    from the predicted duration and the caller chooses t_pad from a text-
    length heuristic, re-running on the rare bucket overflow (detected from
    the returned duration).

    Returns (wav [B, t_pad*chunk] int16|f32, duration [B] f32 — UNCLAMPED,
    so callers can detect t_pad overflow as ceil(dur*sr/chunk) > t_pad).
    """
    dur, emb = text_stage(
        params, cfg, text_ids, text_mask, style_dp, style_ttl, speed,
        precision=precision, attn_fn=attn_fn,
    )
    chunk = cfg.chunk_size
    latent_len = jnp.minimum(
        jnp.ceil(dur * cfg.sample_rate / chunk), float(t_pad)
    )
    frame_idx = jnp.arange(t_pad, dtype=jnp.float32)[None, :]
    latent_mask = (frame_idx < latent_len[:, None]).astype(jnp.float32)
    b = text_ids.shape[0]
    noise = jax.random.normal(key, (b, t_pad, cfg.latent_channels), jnp.float32)
    wav = acoustic_stage(
        params, cfg, emb, style_ttl, text_mask, latent_mask, noise,
        total_step, precision=precision, attn_fn=attn_fn, fused_ffn=fused_ffn,
    )
    if egress == "int16":
        wav = jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
    elif egress == "mulaw":
        wav = _mulaw_encode(wav)
    return wav, dur


def _mulaw_encode(x: jax.Array) -> jax.Array:
    """On-device G.711 mu-law companding: 8-bit egress (quarter of f32,
    half of int16) at ~13-bit speech quality. Host decode:
    utils.mulaw.decode."""
    pcm = jnp.clip(x * 32767.0, -32635.0, 32635.0)
    sign = jnp.where(pcm < 0, 0x80, 0).astype(jnp.int32)
    mag = jnp.abs(pcm).astype(jnp.int32) + 0x84
    # segment exponent via integer threshold comparisons: TPU transcendental
    # log2 can land just below an exact integer at power-of-two magnitudes,
    # dropping the exponent and halving the decoded sample (ADVICE r1)
    exp = jnp.zeros_like(mag)
    for th in (256, 512, 1024, 2048, 4096, 8192, 16384):
        exp = exp + (mag >= th).astype(jnp.int32)
    mant = jax.lax.shift_right_logical(mag, exp + 3) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(jnp.uint8)


def jit_synthesize_fused(cfg: TTSConfig, *, precision="bf16", attn_fn=None,
                         fused_ffn=False,
                         in_shardings=None, out_shardings=None) -> Callable:
    fn = functools.partial(
        synthesize_fused, precision=precision,
        attn_fn=attn_fn or L.attention_core, fused_ffn=fused_ffn,
    )

    def closed(params, ids, mask, sdp, sttl, key, speed, total_step, t_pad,
               egress):
        return fn(params, cfg, ids, mask, sdp, sttl, key, speed,
                  total_step, t_pad, egress=egress)

    kw: dict[str, Any] = {"static_argnums": (7, 8, 9)}
    if in_shardings is not None:
        kw["in_shardings"] = in_shardings
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(closed, **kw)


def jit_text_stage(cfg: TTSConfig, *, precision="bf16", attn_fn=None,
                   in_shardings=None, out_shardings=None) -> Callable:
    """jit of text_stage taking params as a RUNTIME ARGUMENT. Never close jit
    over the 66M-param tree: captured arrays are baked into the HLO as
    constants, which bloats every compiled program by ~235 MB and multiplies
    (remote-)compile time."""
    fn = functools.partial(
        text_stage, precision=precision,
        attn_fn=attn_fn or L.attention_core,
    )

    def closed(params, ids, mask, sdp, sttl, speed):
        return fn(params, cfg, ids, mask, sdp, sttl, speed)

    kw: dict[str, Any] = {}
    if in_shardings is not None:
        kw["in_shardings"] = in_shardings
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(closed, **kw)


def jit_flow_stage(cfg: TTSConfig, *, precision="bf16",
                   attn_fn=None) -> Callable:
    fn = functools.partial(flow_stage, precision=precision,
                           attn_fn=attn_fn or L.attention_core)

    def closed(params, emb, sttl, tmask, lmask, noise, total_step):
        return fn(params, cfg, emb, sttl, tmask, lmask, noise, total_step)

    return jax.jit(closed, static_argnums=(6,))


def jit_vocode_window(cfg: TTSConfig, *, precision="bf16") -> Callable:
    fn = functools.partial(vocode_window, precision=precision)

    def closed(params, xt_pad, mask_pad, start, window, halo, egress):
        return fn(params, cfg, xt_pad, mask_pad, start, window, halo,
                  egress=egress)

    return jax.jit(closed, static_argnums=(4, 5, 6))


def jit_acoustic_stage(cfg: TTSConfig, *, precision="bf16",
                       attn_fn=None, fused_ffn=False,
                       in_shardings=None, out_shardings=None) -> Callable:
    fn = functools.partial(
        acoustic_stage, precision=precision,
        attn_fn=attn_fn or L.attention_core, fused_ffn=fused_ffn,
    )

    def closed(params, emb, sttl, tmask, lmask, noise, total_step):
        return fn(params, cfg, emb, sttl, tmask, lmask, noise, total_step)

    kw: dict[str, Any] = {"static_argnums": (6,)}
    if in_shardings is not None:
        kw["in_shardings"] = in_shardings
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(closed, **kw)
