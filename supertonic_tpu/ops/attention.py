"""Pallas fused attention kernel (TPU).

Drop-in replacement for ``models.layers.attention_core`` (same signature:
q,k,v [B,T,H,Dh], key_mask [B,Tk] -> [B,Tq,H,Dh]), used for both the RoPE
self-attention over latent frames and the LARoPE cross-attention into
[style;text] memory of the vector estimator — the op that runs
``total_step`` times per utterance (reference hot loop, SURVEY.md §3.1).

Design: TTS sequences are short (Tq,Tk <= ~700 at the default geometry), so
whole (Tq,D) / (Tk,D) panels fit VMEM per (batch, head) grid cell — a
single-pass softmax(QK^T)V with zero HBM round-trips for the logits, rather
than a chunked flash kernel whose online-softmax bookkeeping only pays off
at sequence lengths TTS never reaches. Logits/softmax in f32 on the VPU,
both matmuls on the MXU via preferred_element_type=f32.

Falls back to the pure-XLA path on CPU (tests run the kernel in interpreter
mode for parity).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.layers import NEG_INF, attention_core


# VMEM budget guard: beyond this the single-pass panel no longer fits
# (f32 [Tq,Tk] logits alone are 4 MB at 1024, and the all-heads-resident
# [1,H,T,D] q/k/v/o blocks ride along) and we defer to XLA, which chunks
# internally. TTS shapes stay <= ~700.
_MAX_PANEL = 1024


def _to_bhtd(x):
    return x.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# v2: one grid cell per BATCH ROW, heads unrolled inside the kernel.
# A per-(batch, head) grid (the v1 kernel, removed) was launch-bound: B*H tiny programs
# at ~10 us each. One cell per row amortizes the launch over all heads while
# logits/softmax stay in VMEM — the XLA path's dominant cost is exactly the
# ~5 HBM passes over the f32 [B,H,Tq,Tk] logits (measured via xplane trace).
# ---------------------------------------------------------------------------

def _attn_kernel_rows(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                      scale: float, n_heads: int):
    # blocks are [1, H, T, D]: head indexing is a LEADING-dim slice (Mosaic
    # cannot lay out middle-dim slices of [1,T,H,D] blocks)
    if mask_ref is not None:
        bias = (1.0 - mask_ref[0].astype(jnp.float32)) * NEG_INF  # [1, Tk]
    for h in range(n_heads):  # static unroll
        q = q_ref[0, h].astype(jnp.float32)           # [Tq, D]
        k = k_ref[0, h].astype(jnp.float32)           # [Tk, D]
        v = v_ref[0, h]                                # [Tk, D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if mask_ref is not None:
            logits = logits + bias
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
        probs = (probs / jnp.sum(probs, axis=-1, keepdims=True)).astype(v.dtype)
        out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = out.astype(o_ref.dtype)


def _fused_attention_rows_call(q, k, v, key_mask, *, interpret: bool):
    """q,k,v arrive [B,T,H,D]; kernel runs on [B,H,T,D] blocks."""
    qt, kt, vt = _to_bhtd(q), _to_bhtd(k), _to_bhtd(v)
    b, h, tq, d = qt.shape
    tk = kt.shape[2]
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_attn_kernel_rows, scale=scale, n_heads=h)

    def spec(t):
        return pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(tq), spec(tk), spec(tk)]
    args = [qt, kt, vt]
    if key_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, tk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(key_mask.astype(jnp.float32)[:, None, :])
    else:
        kernel = functools.partial(_attn_kernel_rows_nomask, scale=scale,
                                   n_heads=h)

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=spec(tq),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * tq * tk * d * 2,
            bytes_accessed=2 * b * h * (tq + tk) * d * 2,
            transcendentals=b * h * tq * tk,
        ),
    )(*args)
    return _to_bhtd(out)


def _attn_kernel_rows_nomask(q_ref, k_ref, v_ref, o_ref, *, scale, n_heads):
    _attn_kernel_rows(q_ref, k_ref, v_ref, None, o_ref, scale=scale,
                      n_heads=n_heads)


def fused_attention(q, k, v, key_mask=None):
    """Same contract as models.layers.attention_core ([B,T,H,Dh] layout)."""
    tq, tk = q.shape[1], k.shape[1]
    backend = jax.default_backend()
    if tq > _MAX_PANEL or tk > _MAX_PANEL:
        return attention_core(q, k, v, key_mask)
    interpret = backend != "tpu"
    return _fused_attention_rows_call(q, k, v, key_mask, interpret=interpret)


def fused_attention_interpret(q, k, v, key_mask=None):
    """Force interpreter mode (for CPU parity tests). [B,T,H,Dh] layout."""
    return _fused_attention_rows_call(q, k, v, key_mask, interpret=True)
