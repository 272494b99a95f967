"""Core functional layers (pure JAX, explicit param pytrees).

Design notes (TPU-first):
  * Layout is [B, T, C] (channels-last) everywhere — last dim maps to the
    128-lane axis, convs lower to MXU matmuls.
  * Params are nested dicts of float32 arrays; compute dtype is chosen per
    call (bf16 fast path / f32 parity path). All matmuls set
    ``preferred_element_type=float32`` so MXU accumulation stays f32.
  * No data-dependent Python control flow — everything here traces under jit.

The networks built from these layers re-implement the four ONNX graphs of the
reference (I/O contract per SURVEY.md §2.2; reference py/helper.py:177-215),
architectures per the SupertonicTTS paper (arXiv:2503.23108) and LARoPE
(arXiv:2509.11084).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# init helpers — numpy RNG, NOT jax.random: eager jax.random dispatch compiles
# one XLA kernel per distinct shape (~0.7 s each on this host), and production
# weights come from extracted checkpoints anyway. np.random.Generator is
# deterministic and free.
# ---------------------------------------------------------------------------

def _uniform_init(rng: np.random.Generator, shape, scale):
    return rng.uniform(-scale, scale, shape).astype(np.float32)


def linear_init(rng, din: int, dout: int, *, zero: bool = False) -> Params:
    if zero:
        return {"w": np.zeros((din, dout), np.float32),
                "b": np.zeros((dout,), np.float32)}
    scale = 1.0 / math.sqrt(din)
    return {"w": _uniform_init(rng, (din, dout), scale),
            "b": np.zeros((dout,), np.float32)}


def linear(p: Params, x: jax.Array) -> jax.Array:
    if "w_q" in p:
        return _linear_w8a8(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if x.dtype == jnp.bfloat16:
        # store the accumulator bf16 BEFORE the bias add: with the f32 add
        # first, XLA materializes the pre-cast f32 [B,T,D] product at
        # multi-consumer sites in the flow loop (xplane r5: ~10 ms/iter of
        # f32[64,256,512]/[64,242,512] writes at b64 that the op-by-op
        # executor graph — matmul stored bf16, bias added in a bf16
        # fusion — does not pay). The dot still accumulates f32 on the MXU.
        return y.astype(jnp.bfloat16) + p["b"].astype(jnp.bfloat16)
    return (y + p["b"]).astype(x.dtype)


def quantize_linear(p: Params) -> Params:
    """Offline W8A8 quantization of one linear layer: symmetric per-output-
    channel int8 weights + f32 scales. Applied by models.quantize_params for
    the opt-in int8 serving path (v5e int8 MXU peak is 2x bf16)."""
    w = np.asarray(p["w"], np.float32)
    scale = np.maximum(np.max(np.abs(w), axis=0), 1e-12) / 127.0
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {"w_q": w_q, "w_scale": scale.astype(np.float32),
            "b": np.asarray(p["b"], np.float32)}


def _linear_w8a8(p: Params, x: jax.Array) -> jax.Array:
    """Dynamic-activation int8 matmul: per-token symmetric activation quant,
    int8 x int8 -> int32 on the MXU, rescale in f32. The reduction axis
    scale cancels exactly for the max element, so worst-case per-element
    quantization error is bounded by 0.5/127 of the row absmax."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)  # |xf/sx| <= 127 by construction
    acc = jax.lax.dot_general(
        xq, p["w_q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * p["w_scale"]
    return (y + p["b"]).astype(x.dtype)


def embedding_init(rng, vocab: int, dim: int) -> Params:
    return {"table": (rng.standard_normal((vocab, dim)) * 0.02).astype(np.float32)}


def embedding(p: Params, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(p["table"], dtype)[ids]


def layer_norm_init(dim: int) -> Params:
    return {"g": np.ones((dim,), np.float32), "b": np.zeros((dim,), np.float32)}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if x.dtype == jnp.bfloat16:
        # normalize in f32, affine in bf16: the pre-LN output feeds 3 QKV
        # consumers, and with the f32-affine form XLA breaks the fusion at
        # the f32 [B,T,D] point (33 MB written per LN site at b64/T256 —
        # xplane r5, the same finding as linear() above)
        return (y.astype(jnp.bfloat16) * p["g"].astype(jnp.bfloat16)
                + p["b"].astype(jnp.bfloat16))
    return (y * p["g"] + p["b"]).astype(x.dtype)


def conv1d_init(rng, cin: int, cout: int, kernel: int) -> Params:
    scale = 1.0 / math.sqrt(cin * kernel)
    return {"w": _uniform_init(rng, (kernel, cin, cout), scale),
            "b": np.zeros((cout,), np.float32)}


def conv1d(p: Params, x: jax.Array, *, dilation: int = 1, padding: str | int = "SAME") -> jax.Array:
    """x: [B, T, C] -> [B, T', C']. 'SAME' keeps T for odd kernels."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "SAME":
        k = p["w"].shape[0]
        total = dilation * (k - 1)
        pad = [(total // 2, total - total // 2)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return (y + p["b"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings (standard + length-aware)
# ---------------------------------------------------------------------------

def rope_angles(positions: jax.Array, head_dim: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """positions [..., T] -> (cos, sin) each [..., T, head_dim//2]."""
    half = head_dim // 2
    freqs = jnp.exp(
        -math.log(theta) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, T, H, Dh]; cos/sin: [B, T, Dh//2] (broadcast over heads).

    The rotation math still runs in f32 (x1*cos promotes element-wise, the
    f32 cos/sin tables dominate the precision), but x is NOT upcast before
    the split: an explicit f32 upcast of the whole tensor makes XLA
    materialize the PRODUCER — the Q/K projection matmuls, whose f32
    accumulator it would otherwise round to bf16 — as full f32 [B,T,D]
    HBM tensors plus a layout copy to feed the rope fusion (xplane r5:
    ~3 ms/iter of the b64 flow loop; the op-by-op executor graph, whose
    decomposed rope consumes bf16, does not pay this)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    if cos.ndim == 3:  # [B, T, Dh//2] -> add head axis
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def larope_positions(lengths: jax.Array, padded_len: int, scale: float) -> jax.Array:
    """Length-Aware RoPE positions (arXiv:2509.11084): index i of a sequence
    with true length L maps to ``i * scale / L`` so that text and latent
    sequences share a normalized [0, scale) position axis and cross-attention
    distance is measured along the proportional alignment diagonal.

    lengths: [B] true lengths; returns [B, padded_len] float32 positions.
    """
    idx = jnp.arange(padded_len, dtype=jnp.float32)[None, :]
    return idx * (scale / jnp.maximum(lengths.astype(jnp.float32), 1.0))[:, None]


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def mha_init(rng, dim: int, *, kv_dim: int | None = None) -> Params:
    kv_dim = kv_dim or dim
    return {
        "q": linear_init(rng, dim, dim),
        "k": linear_init(rng, kv_dim, dim),
        "v": linear_init(rng, kv_dim, dim),
        "o": linear_init(rng, dim, dim),
    }


def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """[B, T, D] -> [B, T, H, Dh] — NO transpose: the [B,T,H,Dh] layout lets
    XLA fold head batching into the attention einsums instead of emitting
    explicit copy ops (measured ~10% of the estimator step)."""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def kt_cache_enabled() -> bool:
    """Opt-in transposed cross-attention K cache (env TTS_KT_CACHE=1, read
    at trace time): kv_project emits k as [B,H,Dh,Tk] so the per-step
    projection writes the logits matmul's preferred layout directly
    (xplane r5: the standard layout costs a {2,1,0}->{1,2,0} relayout copy
    per block per step in the fused flow loop). Only honored on the
    default attention_core path — custom attn_fn kernels keep the
    standard [B,Tk,H,Dh] contract."""
    import os

    return os.environ.get("TTS_KT_CACHE", "0") == "1"


def attention_core(q, k, v, key_mask, *, k_transposed: bool = False) -> jax.Array:
    """q,v: [B,T,H,Dh]; k: [B,Tk,H,Dh], or pre-transposed [B,H,Dh,Tk] when
    ``k_transposed`` (the opt-in TTS_KT_CACHE cross-cache layout — see
    kv_project); key_mask: [B, Tk] (1 = valid). Returns [B,Tq,H,Dh].

    Plain XLA path; the Pallas fused kernel in ops/attention.py is a drop-in
    replacement selected by the engine (standard k layout only).
    """
    dh = q.shape[-1]
    if k_transposed:
        # [B,H,Dh,Tk] k: contraction written against the lane-major layout
        # the logits matmul wants, so the per-step cross K projection feeds
        # it without the {2,1,0}->{1,2,0} relayout copy (xplane r5)
        logits = jnp.einsum(
            "bqhd,bhdk->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
    else:
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
    if key_mask is not None:
        bias = (1.0 - key_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
        logits = logits + bias
    if q.dtype == jnp.bfloat16:
        # fast path: store the [B,H,Tq,Tk] logits in bf16 — halves the
        # largest HBM tensor in the estimator step (measured +18%
        # throughput at b64/5-step); softmax still reduces in f32.
        # f32 parity path keeps f32 logits end-to-end.
        logits = logits.astype(jnp.bfloat16)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def mha(
    p: Params,
    x: jax.Array,
    n_heads: int,
    memory: jax.Array | None = None,
    *,
    key_mask: jax.Array | None = None,
    q_rope: tuple[jax.Array, jax.Array] | None = None,
    k_rope: tuple[jax.Array, jax.Array] | None = None,
    attn_fn=attention_core,
    kv_cache: tuple[jax.Array, jax.Array] | None = None,
    kv_transposed: bool = False,
) -> jax.Array:
    """Multi-head attention; self-attn when memory is None.

    ``kv_cache``: precomputed (k, v), already head-split and rotated — used
    to hoist loop-invariant cross-attention K/V out of the flow loop
    (the text memory never changes across denoise steps).

    Supports fused projections (derived offline by models.fuse_projections):
    "qkv" replaces q/k/v for self-attn, "kv" replaces k/v for cross-attn —
    fewer, larger matmuls (better MXU occupancy, fewer kernel launches).
    """
    if kv_cache is not None:
        q = _split_heads(linear(p["q"], x), n_heads)
        if q_rope is not None:
            q = apply_rope(q, *q_rope)
        k, v = kv_cache
        if kv_transposed:  # k is [B,H,Dh,Tk] (kv_project transposed=True);
            # only attention_core understands this layout — the engine
            # gates the flag off for custom attn_fn kernels
            out = attn_fn(q, k, v, key_mask, k_transposed=True)
        else:
            out = attn_fn(q, k, v, key_mask)
        return linear(p["o"], _merge_heads(out))
    mem = x if memory is None else memory
    if memory is None and "qkv" in p:
        qkv = linear(p["qkv"], x)
        q_, k_, v_ = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q_, n_heads)
        k = _split_heads(k_, n_heads)
        v = _split_heads(v_, n_heads)
    elif "kv" in p:
        q = _split_heads(linear(p["q"], x), n_heads)
        kv = linear(p["kv"], mem)
        k_, v_ = jnp.split(kv, 2, axis=-1)
        k = _split_heads(k_, n_heads)
        v = _split_heads(v_, n_heads)
    else:
        q = _split_heads(linear(p["q"], x), n_heads)
        k = _split_heads(linear(p["k"], mem), n_heads)
        v = _split_heads(linear(p["v"], mem), n_heads)
    if q_rope is not None:
        q = apply_rope(q, *q_rope)
    if k_rope is not None:
        k = apply_rope(k, *k_rope)
    out = attn_fn(q, k, v, key_mask)
    return linear(p["o"], _merge_heads(out))


def kv_project(p: Params, mem: jax.Array, n_heads: int,
               k_rope=None, *, transposed: bool = False
               ) -> tuple[jax.Array, jax.Array]:
    """Project memory into head-split (k, v) with optional rotation —
    the precompute half of a cross-attention KV cache.

    ``transposed`` (opt-in, env TTS_KT_CACHE at the engine): emit k as
    [B,H,Dh,Tk] so the logits matmul consumes it in its preferred
    lane-major layout — the adjacent explicit transpose lets XLA's layout
    assignment produce the projection directly in that layout instead of
    inserting a per-step relayout copy (attention_core k_transposed arm;
    standard layout remains the contract for custom attn_fn kernels)."""
    if "kv" in p:
        kv = linear(p["kv"], mem)
        k_, v_ = jnp.split(kv, 2, axis=-1)
        k = _split_heads(k_, n_heads)
        v = _split_heads(v_, n_heads)
    else:
        k = _split_heads(linear(p["k"], mem), n_heads)
        v = _split_heads(linear(p["v"], mem), n_heads)
    if k_rope is not None:
        k = apply_rope(k, *k_rope)
    if transposed:
        k = jnp.transpose(k, (0, 2, 3, 1))  # [B,T,H,D] -> [B,H,D,T]
    return k, v


# ---------------------------------------------------------------------------
# FFN + transformer blocks
# ---------------------------------------------------------------------------

def ffn_init(rng, dim: int, mult: int) -> Params:
    return {"in": linear_init(rng, dim, dim * mult),
            "out": linear_init(rng, dim * mult, dim)}


def ffn(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["out"], jax.nn.silu(linear(p["in"], x)))


def block_init(rng, dim: int, ffn_mult: int, *,
               cross_dim: int | None = None, adaln: bool = False,
               cond_dim: int | None = None) -> Params:
    p: Params = {
        "ln1": layer_norm_init(dim),
        "self": mha_init(rng, dim),
        "ln3": layer_norm_init(dim),
        "ffn": ffn_init(rng, dim, ffn_mult),
    }
    if cross_dim is not None:
        p["ln2"] = layer_norm_init(dim)
        p["cross"] = mha_init(rng, dim, kv_dim=cross_dim)
    if adaln:
        n_sub = 3 if cross_dim is not None else 2
        # AdaLN-Zero (DiT-style): cond -> shift/scale/gate per sublayer,
        # zero-init so the block starts as identity.
        p["adaln"] = linear_init(rng, cond_dim or dim, 3 * n_sub * dim, zero=True)
    return p


def _modulate(x, shift, scale):
    return x * (1.0 + scale) + shift


def block(
    p: Params,
    x: jax.Array,
    n_heads: int,
    *,
    self_mask: jax.Array | None = None,
    self_rope=None,
    memory: jax.Array | None = None,
    memory_mask: jax.Array | None = None,
    q_rope_cross=None,
    k_rope_cross=None,
    cond: jax.Array | None = None,
    attn_fn=attention_core,
    fused_ffn: bool = False,
    cross_kv: tuple[jax.Array, jax.Array] | None = None,
    cross_kv_transposed: bool = False,
) -> jax.Array:
    """Pre-LN transformer block: self-attn [+ cross-attn] + FFN, optionally
    AdaLN-Zero conditioned on ``cond`` [B, cond_dim]. ``fused_ffn`` routes
    the AdaLN-FFN sublayer through the Pallas kernel (ops/ffn.py)."""
    has_cross = "cross" in p
    if cond is not None and "adaln" in p:
        mods = linear(p["adaln"], cond)[:, None, :]  # [B,1,3*n_sub*dim]
        n_sub = 3 if has_cross else 2
        mods = jnp.split(mods, 3 * n_sub, axis=-1)
    else:
        mods = None

    def mod(i, h):
        if mods is None:
            return h, 1.0
        shift, scale, gate = mods[3 * i], mods[3 * i + 1], mods[3 * i + 2]
        return _modulate(h, shift, scale), gate

    i_sub = 0
    h, gate = mod(i_sub, layer_norm(p["ln1"], x))
    x = x + gate * mha(p["self"], h, n_heads, key_mask=self_mask,
                       q_rope=self_rope, k_rope=self_rope, attn_fn=attn_fn)
    i_sub += 1
    if has_cross:
        h, gate = mod(i_sub, layer_norm(p["ln2"], x))
        x = x + gate * mha(p["cross"], h, n_heads, memory=memory,
                           key_mask=memory_mask,
                           q_rope=q_rope_cross, k_rope=k_rope_cross,
                           attn_fn=attn_fn, kv_cache=cross_kv,
                           kv_transposed=cross_kv_transposed)
        i_sub += 1
    if fused_ffn and mods is not None:
        from ..ops.ffn import fused_adaln_ffn

        shift, scale, gate = (mods[3 * i_sub], mods[3 * i_sub + 1],
                              mods[3 * i_sub + 2])
        return fused_adaln_ffn(
            x,
            jnp.asarray(p["ln3"]["g"]), jnp.asarray(p["ln3"]["b"]),
            jnp.asarray(p["ffn"]["in"]["w"], x.dtype),
            jnp.asarray(p["ffn"]["in"]["b"], jnp.float32),
            jnp.asarray(p["ffn"]["out"]["w"], x.dtype),
            jnp.asarray(p["ffn"]["out"]["b"], jnp.float32),
            shift, scale, gate,
        )
    h, gate = mod(i_sub, layer_norm(p["ln3"], x))
    x = x + gate * ffn(p["ffn"], h)
    return x


# ---------------------------------------------------------------------------
# Time embedding (flow step conditioning)
# ---------------------------------------------------------------------------

def sinusoidal_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """t: [B] in [0, 1] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :] * 1000.0
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def count_params(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(np.prod(l.shape) for l in leaves if hasattr(l, "shape")))
