"""Flow-matching vector estimator (the denoiser).

I/O contract (reference SURVEY.md §2.2; cpp/helper.cpp:620-623,
go/helper.go:885-887):
    inputs : noisy_latent f32 [B, C, T] (C = latent_dim * ccf),
             text_emb [B, L, odim], style_ttl [B, S, D],
             text_mask [B, L], latent_mask [B, T],
             current_step f32 [B], total_step f32 [B]
    output : denoised_latent f32 — SAME SHAPE as noisy_latent.

Critically, the reference graph applies the whole per-step transform
internally — the host loop feeds x_t back in and receives x_{t+1} directly
(reference py/helper.py:200-213). We reproduce that: `step` computes the
velocity field AND applies the Euler update
    x_{t+dt} = x_t + (1/total_step) * v(x_t, t),   t = current/total.

Architecture (ours, per SupertonicTTS arXiv:2503.23108): DiT-style blocks
with AdaLN-Zero time conditioning, RoPE self-attention over latent frames and
LARoPE (arXiv:2509.11084) cross-attention into [style tokens ; text
embeddings] memory. Internal layout is [B, T, C]; the engine owns layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from . import layers as L


def init(rng, cfg: TTSConfig) -> L.Params:
    hp = cfg.vector_estimator
    c_lat = cfg.latent_channels
    style_dim = cfg.ttl.style.style_value_dim
    text_dim = cfg.ttl.proj_out_odim
    return {
        "in_proj": L.linear_init(rng, c_lat, hp.dim),
        "style_proj": L.linear_init(rng, style_dim, hp.dim),
        "text_proj": L.linear_init(rng, text_dim, hp.dim),
        "time_mlp1": L.linear_init(rng, hp.time_embed_dim, hp.dim),
        "time_mlp2": L.linear_init(rng, hp.dim, hp.dim),
        "blocks": [
            L.block_init(rng, hp.dim, hp.ffn_mult, cross_dim=hp.dim,
                         adaln=True, cond_dim=hp.dim)
            for _ in range(hp.n_layers)
        ],
        "ln_out": L.layer_norm_init(hp.dim),
        "adaln_out": L.linear_init(rng, hp.dim, 2 * hp.dim, zero=True),
        "out_proj": L.linear_init(rng, hp.dim, c_lat, zero=True),
    }


def precompute_cross(
    params: L.Params,
    cfg: TTSConfig,
    text_emb: jax.Array,    # [B, L, odim]
    style_ttl: jax.Array,   # [B, S, D]
    text_mask: jax.Array,   # [B, L]
    *,
    dtype=jnp.float32,
    transposed: bool = False,
):
    """Everything about the cross-attention memory that is INVARIANT across
    denoise steps: projected [style;text] memory, its mask, and per-block
    head-split+rotated (K, V). Hoisting this out of the flow loop saves
    2 matmuls + rope per block per step (the reference pays them inside its
    vector_estimator graph on every call, py/helper.py:200-213).

    ``transposed``: emit each k as [B,H,Dh,Tk] (layers.kv_project) — the
    opt-in TTS_KT_CACHE layout; the flag travels IN the returned cache so
    producer and consumer cannot disagree.

    Returns (mem_mask [B, S+L], [(k, v)] per block, transposed).
    """
    hp = cfg.vector_estimator
    b = text_emb.shape[0]
    # memory = [style tokens ; projected text]; style tokens carry no
    # positional rotation (angle 0), text tokens carry LARoPE positions.
    style = L.linear(params["style_proj"], style_ttl.astype(dtype))
    text = L.linear(params["text_proj"], text_emb.astype(dtype))
    memory = jnp.concatenate([style, text], axis=1)
    s_len = style.shape[1]
    mem_mask = jnp.concatenate(
        [jnp.ones((b, s_len), text_mask.dtype), text_mask], axis=1
    )
    head_dim = hp.dim // hp.n_heads
    text_len = jnp.sum(text_mask, axis=-1)
    text_pos = L.larope_positions(text_len, text.shape[1], hp.larope_scale)
    # style positions = 0 -> cos 1, sin 0 -> identity rotation
    mem_pos = jnp.concatenate(
        [jnp.zeros((b, s_len), jnp.float32), text_pos], axis=1
    )
    mem_rope = L.rope_angles(mem_pos, head_dim, hp.larope_theta)
    kvs = [
        L.kv_project(bp["cross"], memory, hp.n_heads, k_rope=mem_rope,
                     transposed=transposed)
        for bp in params["blocks"]
    ]
    return mem_mask, kvs, transposed


def velocity(
    params: L.Params,
    cfg: TTSConfig,
    latent: jax.Array,      # [B, T, C] (layout already transposed by engine)
    text_emb: jax.Array,    # [B, L, odim]
    style_ttl: jax.Array,   # [B, S, D]
    text_mask: jax.Array,   # [B, L]
    latent_mask: jax.Array, # [B, T]
    t: jax.Array,           # [B] in [0, 1)
    *,
    dtype=jnp.float32,
    attn_fn=L.attention_core,
    fused_ffn: bool = False,
    cross_cache=None,
) -> jax.Array:
    hp = cfg.vector_estimator
    b, T, _ = latent.shape
    x = L.linear(params["in_proj"], latent.astype(dtype))

    # time conditioning
    temb = L.sinusoidal_embedding(t, hp.time_embed_dim).astype(dtype)
    cond = L.linear(params["time_mlp2"],
                    jax.nn.silu(L.linear(params["time_mlp1"], temb)))

    if cross_cache is None:
        cross_cache = precompute_cross(
            params, cfg, text_emb, style_ttl, text_mask, dtype=dtype,
            # transposed-K layout only on the default attention path —
            # custom attn_fn kernels keep the standard [B,Tk,H,Dh] contract
            transposed=(L.kt_cache_enabled()
                        and attn_fn is L.attention_core),
        )
    mem_mask, kvs, kt = cross_cache

    head_dim = hp.dim // hp.n_heads
    lat_len = jnp.sum(latent_mask, axis=-1)
    q_pos = L.larope_positions(lat_len, T, hp.larope_scale)
    q_rope = L.rope_angles(q_pos, head_dim, hp.larope_theta)

    for bp, kv in zip(params["blocks"], kvs):
        x = L.block(
            bp, x, hp.n_heads,
            self_mask=latent_mask, self_rope=q_rope,
            memory_mask=mem_mask,
            q_rope_cross=q_rope,
            cond=cond, attn_fn=attn_fn, fused_ffn=fused_ffn,
            cross_kv=kv, cross_kv_transposed=kt,
        )

    h = L.layer_norm(params["ln_out"], x)
    shift, scale = jnp.split(L.linear(params["adaln_out"], cond)[:, None, :], 2, axis=-1)
    h = h * (1.0 + scale) + shift
    v = L.linear(params["out_proj"], h)
    return v.astype(jnp.float32) * latent_mask[:, :, None]


def step(
    params: L.Params,
    cfg: TTSConfig,
    noisy_latent: jax.Array,   # [B, T, C]
    text_emb: jax.Array,
    style_ttl: jax.Array,
    text_mask: jax.Array,
    latent_mask: jax.Array,
    current_step: jax.Array,   # [B] float
    total_step: jax.Array,     # [B] float
    *,
    dtype=jnp.float32,
    attn_fn=L.attention_core,
    fused_ffn: bool = False,
    cross_cache=None,
) -> jax.Array:
    """One full flow step: x_{t+dt} = x_t + dt * v(x_t, t). Matches the
    reference vector_estimator.onnx call-site semantics exactly.
    ``cross_cache`` (from precompute_cross) skips the loop-invariant memory
    projections — same math, hoisted."""
    t = current_step / total_step
    dt = (1.0 / total_step)[:, None, None]
    v = velocity(
        params, cfg, noisy_latent, text_emb, style_ttl,
        text_mask, latent_mask, t, dtype=dtype, attn_fn=attn_fn,
        fused_ffn=fused_ffn, cross_cache=cross_cache,
    )
    x = noisy_latent.astype(jnp.float32) + dt * v
    return x * latent_mask[:, :, None]
