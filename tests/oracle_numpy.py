"""Pure-numpy oracle: an INDEPENDENT re-implementation of the forward math
of every layer, used to verify the JAX modules numerically (f32 path).

This fills the role the ONNX graphs play in the reference-parity plan
(SURVEY.md §4: "the ONNX graphs themselves become the oracle") until the
real assets are mountable; the harness structure — same params, same inputs,
allclose on outputs — is exactly what the ONNX comparison will reuse.
"""

from __future__ import annotations

import math

import numpy as np


def linear(p, x):
    return x @ np.asarray(p["w"], np.float32) + np.asarray(p["b"], np.float32)


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(p["g"]) + np.asarray(p["b"])


def silu(x):
    return x / (1.0 + np.exp(-x))


def softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def embedding(p, ids):
    return np.asarray(p["table"], np.float32)[ids]


def conv1d(p, x, dilation=1):
    """x [B,T,C] 'SAME' conv via explicit gather (independent of lax)."""
    w = np.asarray(p["w"], np.float32)  # [k, cin, cout]
    k = w.shape[0]
    total = dilation * (k - 1)
    lo = total // 2
    b, t, _ = x.shape
    xp = np.pad(x, ((0, 0), (lo, total - lo), (0, 0)))
    out = np.zeros((b, t, w.shape[2]), np.float32)
    for i in range(k):
        out += xp[:, i * dilation : i * dilation + t] @ w[i]
    return out + np.asarray(p["b"], np.float32)


def rope_angles(positions, head_dim, theta):
    half = head_dim // 2
    freqs = np.exp(-math.log(theta) * np.arange(half, dtype=np.float32) / half)
    ang = positions[..., None].astype(np.float32) * freqs
    return np.cos(ang), np.sin(ang)


def apply_rope(x, cos, sin):
    # x [B,H,T,D]; cos/sin [B,T,D/2]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, None]
    sin = sin[:, None]
    return np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)


def larope_positions(lengths, padded_len, scale):
    idx = np.arange(padded_len, dtype=np.float32)[None, :]
    return idx * (scale / np.maximum(lengths.astype(np.float32), 1.0))[:, None]


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def attention(q, k, v, key_mask):
    d = q.shape[-1]
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d)
    if key_mask is not None:
        logits = logits + (1.0 - key_mask[:, None, None, :]) * -1e9
    return np.einsum("bhqk,bhkd->bhqd", softmax(logits), v)


def _split_heads(x, h):
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dh = x.transpose(0, 2, 1, 3).shape[0], *x.shape[1:],
    b, h, t, dh = x.shape
    y = x.transpose(0, 2, 1, 3)
    return y.reshape(b, t, h * dh)


def mha(p, x, n_heads, memory=None, key_mask=None, q_rope=None, k_rope=None):
    mem = x if memory is None else memory
    q = _split_heads(linear(p["q"], x), n_heads)
    k = _split_heads(linear(p["k"], mem), n_heads)
    v = _split_heads(linear(p["v"], mem), n_heads)
    if q_rope is not None:
        q = apply_rope(q, *q_rope)
    if k_rope is not None:
        k = apply_rope(k, *k_rope)
    return linear(p["o"], _merge_heads(attention(q, k, v, key_mask)))


def ffn(p, x):
    return linear(p["out"], silu(linear(p["in"], x)))


def block(p, x, n_heads, self_mask=None, self_rope=None, memory=None,
          memory_mask=None, q_rope_cross=None, k_rope_cross=None, cond=None):
    has_cross = "cross" in p
    if cond is not None and "adaln" in p:
        n_sub = 3 if has_cross else 2
        mods = np.split(linear(p["adaln"], cond)[:, None, :], 3 * n_sub, axis=-1)
    else:
        mods = None

    def mod(i, h):
        if mods is None:
            return h, 1.0
        return h * (1.0 + mods[3 * i + 1]) + mods[3 * i], mods[3 * i + 2]

    i = 0
    h, g = mod(i, layer_norm(p["ln1"], x))
    x = x + g * mha(p["self"], h, n_heads, key_mask=self_mask,
                    q_rope=self_rope, k_rope=self_rope)
    i += 1
    if has_cross:
        h, g = mod(i, layer_norm(p["ln2"], x))
        x = x + g * mha(p["cross"], h, n_heads, memory=memory,
                        key_mask=memory_mask, q_rope=q_rope_cross,
                        k_rope=k_rope_cross)
        i += 1
    h, g = mod(i, layer_norm(p["ln3"], x))
    return x + g * ffn(p["ffn"], h)


def sinusoidal_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half, dtype=np.float32) / half)
    ang = t.astype(np.float32)[:, None] * freqs[None, :] * 1000.0
    return np.concatenate([np.cos(ang), np.sin(ang)], -1)


# ---------------------------------------------------------------------------
# full models
# ---------------------------------------------------------------------------

def duration_predictor(params, cfg, text_ids, style_dp, text_mask):
    hp = cfg.duration_predictor
    x = embedding(params["embed"], text_ids)
    style = linear(params["style_proj"], style_dp)
    text_len = text_mask.sum(-1)
    pos = larope_positions(text_len, text_ids.shape[1],
                           cfg.vector_estimator.larope_scale)
    rope = rope_angles(pos, hp.dim // hp.n_heads,
                       cfg.vector_estimator.larope_theta)
    for bp in params["blocks"]:
        x = block(bp, x, hp.n_heads, self_mask=text_mask, self_rope=rope,
                  memory=style)
    x = layer_norm(params["ln_out"], x)
    m = text_mask[:, :, None]
    pooled = (x * m).sum(1) / np.maximum(m.sum(1), 1.0)
    h = silu(linear(params["head1"], pooled))
    rate = softplus(linear(params["head2"], h)[..., 0])
    return rate * text_len


def text_encoder(params, cfg, text_ids, style_ttl, text_mask):
    hp = cfg.text_encoder
    m = text_mask[:, :, None]
    x = embedding(params["embed"], text_ids) * m
    x = x + silu(conv1d(params["prenet1"], x)) * m
    x = x + silu(conv1d(params["prenet2"], x)) * m
    style = linear(params["style_proj"], style_ttl)
    text_len = text_mask.sum(-1)
    pos = larope_positions(text_len, text_ids.shape[1],
                           cfg.vector_estimator.larope_scale)
    rope = rope_angles(pos, hp.dim // hp.n_heads,
                       cfg.vector_estimator.larope_theta)
    for bp in params["blocks"]:
        x = block(bp, x, hp.n_heads, self_mask=text_mask, self_rope=rope,
                  memory=style)
    x = layer_norm(params["ln_out"], x)
    return linear(params["proj_out"], x) * m


def vector_estimator_step(params, cfg, latent, text_emb, style_ttl, text_mask,
                          latent_mask, current_step, total_step):
    hp = cfg.vector_estimator
    b, T, _ = latent.shape
    t = current_step / total_step
    x = linear(params["in_proj"], latent)
    temb = sinusoidal_embedding(t, hp.time_embed_dim)
    cond = linear(params["time_mlp2"], silu(linear(params["time_mlp1"], temb)))
    style = linear(params["style_proj"], style_ttl)
    text = linear(params["text_proj"], text_emb)
    memory = np.concatenate([style, text], 1)
    s_len = style.shape[1]
    mem_mask = np.concatenate([np.ones((b, s_len), np.float32), text_mask], 1)
    head_dim = hp.dim // hp.n_heads
    lat_len = latent_mask.sum(-1)
    text_len = text_mask.sum(-1)
    q_pos = larope_positions(lat_len, T, hp.larope_scale)
    text_pos = larope_positions(text_len, text.shape[1], hp.larope_scale)
    mem_pos = np.concatenate([np.zeros((b, s_len), np.float32), text_pos], 1)
    q_rope = rope_angles(q_pos, head_dim, hp.larope_theta)
    mem_rope = rope_angles(mem_pos, head_dim, hp.larope_theta)
    for bp in params["blocks"]:
        x = block(bp, x, hp.n_heads, self_mask=latent_mask, self_rope=q_rope,
                  memory=memory, memory_mask=mem_mask, q_rope_cross=q_rope,
                  k_rope_cross=mem_rope, cond=cond)
    h = layer_norm(params["ln_out"], x)
    shift, scale = np.split(linear(params["adaln_out"], cond)[:, None, :], 2, -1)
    h = h * (1.0 + scale) + shift
    v = linear(params["out_proj"], h) * latent_mask[:, :, None]
    dt = (1.0 / total_step)[:, None, None]
    return (latent + dt * v) * latent_mask[:, :, None]


def vocoder(params, cfg, latent):
    hp = cfg.vocoder

    def resblock(p, x):
        for cp, d in zip(p["convs"], hp.resblock_dilations):
            h = conv1d(cp["a"], silu(x), dilation=d)
            h = conv1d(cp["b"], silu(h))
            x = x + h
        return x

    x = conv1d(params["pre"], latent)
    x = resblock(params["pre_res"], x)
    for sp, factor in zip(params["stages"], hp.upsample_factors):
        h = conv1d(sp["up"], silu(x))
        b, t, cf = h.shape
        x = h.reshape(b, t * factor, cf // factor)
        x = resblock(sp["res"], x)
    wav = conv1d(params["head"], silu(x))
    b, tf, d = wav.shape
    return np.tanh(wav.reshape(b, tf * d))
