"""Utterance-level duration predictor.

I/O contract (reference SURVEY.md §2.2; cpp/helper.cpp:512-513,
go/helper.go:873-874):
    inputs : text_ids i64 [B, L], style_dp f32 [B, S_dp, D_dp],
             text_mask f32 [B, L] (engine squeezes the reference's [B,1,L])
    output : duration f32 [B]  — total utterance duration in SECONDS.

Architecture (ours, per SupertonicTTS arXiv:2503.23108 §duration): character
embeddings -> transformer blocks with RoPE self-attention over text and
cross-attention to the pre-computed style tokens -> masked mean-pool ->
MLP head -> softplus SPEAKING RATE (seconds per character), multiplied by the
true character count. Predicting rate x length instead of raw seconds bakes
in the dominant linear dependence of duration on text length; the head bias
is initialized so a fresh model speaks at ~15 chars/sec (a realistic prior).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from . import layers as L


def init(rng, cfg: TTSConfig) -> L.Params:
    hp = cfg.duration_predictor
    style_dim = cfg.dp.style.style_value_dim
    return {
        "embed": L.embedding_init(rng, hp.vocab_size, hp.dim),
        "style_proj": L.linear_init(rng, style_dim, hp.dim),
        "blocks": [
            L.block_init(rng, hp.dim, hp.ffn_mult, cross_dim=hp.dim)
            for _ in range(hp.n_layers)
        ],
        "ln_out": L.layer_norm_init(hp.dim),
        "head1": L.linear_init(rng, hp.dim, hp.dim),
        "head2": _rate_head_init(rng, hp.dim),
    }


def _rate_head_init(rng, dim: int) -> L.Params:
    import numpy as np

    head = L.linear_init(rng, dim, 1)
    # softplus(bias) = 1/15 s per char  =>  ~15 chars/sec at init
    head["b"] = np.full((1,), np.log(np.expm1(1.0 / 15.0)), np.float32)
    # damp the random contribution so init-time rates stay near the prior
    head["w"] = (head["w"] * 0.1).astype(np.float32)
    return head


def apply(
    params: L.Params,
    cfg: TTSConfig,
    text_ids: jax.Array,     # [B, L] int
    style_dp: jax.Array,     # [B, S, D]
    text_mask: jax.Array,    # [B, L] float (1 = valid)
    *,
    dtype=jnp.float32,
    attn_fn=L.attention_core,
) -> jax.Array:
    hp = cfg.duration_predictor
    x = L.embedding(params["embed"], text_ids, dtype=dtype)
    style = L.linear(params["style_proj"], style_dp.astype(dtype))
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
    # masked mean pool over text positions
    m = text_mask.astype(x.dtype)[:, :, None]
    pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    h = jax.nn.silu(L.linear(params["head1"], pooled))
    rate = jax.nn.softplus(
        L.linear(params["head2"], h)[..., 0].astype(jnp.float32)
    )  # seconds per character
    return rate * text_len.astype(jnp.float32)
