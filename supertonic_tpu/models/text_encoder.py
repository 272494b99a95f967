"""Text encoder.

I/O contract (reference SURVEY.md §2.2; cpp/helper.cpp:545-546,
go/helper.go:879-880):
    inputs : text_ids i64 [B, L], style_ttl f32 [B, S, D],
             text_mask f32 [B, L]
    output : text_emb f32 [B, L, odim]

Architecture (ours): character embedding -> depthwise-light conv prenet
(local character context; convs lower onto the MXU in NLC layout) ->
transformer blocks with RoPE self-attention and cross-attention to style
tokens -> proj_out (idim -> odim per tts.json, reference go/helper.go:64-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from . import layers as L


def init(rng, cfg: TTSConfig) -> L.Params:
    hp = cfg.text_encoder
    style_dim = cfg.ttl.style.style_value_dim
    return {
        "embed": L.embedding_init(rng, hp.vocab_size, hp.dim),
        "style_proj": L.linear_init(rng, style_dim, hp.dim),
        "prenet1": L.conv1d_init(rng, hp.dim, hp.dim, hp.conv_kernel),
        "prenet2": L.conv1d_init(rng, hp.dim, hp.dim, hp.conv_kernel),
        "blocks": [
            L.block_init(rng, hp.dim, hp.ffn_mult, cross_dim=hp.dim)
            for _ in range(hp.n_layers)
        ],
        "ln_out": L.layer_norm_init(hp.dim),
        "proj_out": L.linear_init(rng, cfg.ttl.proj_out_idim,
                                  cfg.ttl.proj_out_odim),
    }


def apply(
    params: L.Params,
    cfg: TTSConfig,
    text_ids: jax.Array,    # [B, L]
    style_ttl: jax.Array,   # [B, S, D]
    text_mask: jax.Array,   # [B, L]
    *,
    dtype=jnp.float32,
    attn_fn=L.attention_core,
) -> jax.Array:
    hp = cfg.text_encoder
    m = text_mask.astype(dtype)[:, :, None]
    x = L.embedding(params["embed"], text_ids, dtype=dtype) * m
    x = x + jax.nn.silu(L.conv1d(params["prenet1"], x)) * m
    x = x + jax.nn.silu(L.conv1d(params["prenet2"], x)) * m
    style = L.linear(params["style_proj"], style_ttl.astype(dtype))
    text_len = jnp.sum(text_mask, axis=-1)
    pos = L.larope_positions(text_len, text_ids.shape[1],
                             cfg.vector_estimator.larope_scale)
    rope = L.rope_angles(pos, hp.dim // hp.n_heads,
                         cfg.vector_estimator.larope_theta)
    for bp in params["blocks"]:
        x = L.block(
            bp, x, hp.n_heads,
            self_mask=text_mask, self_rope=rope,
            memory=style, memory_mask=None,
            attn_fn=attn_fn,
        )
    x = L.layer_norm(params["ln_out"], x)
    return L.linear(params["proj_out"], x) * m
