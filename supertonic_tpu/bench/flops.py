"""Analytic FLOP model of the fused synthesis program (VERDICT r2 item 5).

Counts multiply-accumulates as 2 FLOPs across the matmul / attention / conv
terms of the four networks (models/*.py), at the padded bucket shapes the
engine actually dispatches. Element-wise ops, norms, RoPE and the softmax
are excluded (<2% of total at serving shapes) — this is a *matmul-FLOP*
model, the convention MFU is defined under.

Cross-attention K/V projections inside the flow loop are counted ONCE, not
``total_step`` times: the memory is loop-invariant and XLA LICM hoists them
(docs/PERFORMANCE.md), so counting them per step would overstate work that
the chip does not do.

Validated against XLA's own ``compiled.cost_analysis()['flops']`` in
tests/test_flops.py (within modeling tolerance on the CPU backend).
"""

from __future__ import annotations

import math

from ..config import TTSConfig

# Published bf16 dense peak for the chips this targets. Overridable because
# MFU is only meaningful relative to the part you actually run on.
PEAK_TFLOPS = {
    "v5e": 197.0,      # TPU v5 lite (v5e): 197 TFLOP/s bf16
    "v5p": 459.0,
    "v4": 275.0,
    "cpu": float("nan"),
}


def _mm(rows: float, din: int, dout: int) -> float:
    return 2.0 * rows * din * dout


def _block(seq: float, dim: int, ffn_mult: int, *, mem: float | None = None,
           kv_dim: int | None = None, adaln: bool = False,
           cond_dim: int | None = None, count_kv: bool = True) -> float:
    """One pre-LN transformer block (layers.block) for ONE batch row."""
    f = 0.0
    # self-attention: q/k/v/o projections + logits + probs@V
    f += 4 * _mm(seq, dim, dim)
    f += 2 * 2.0 * seq * seq * dim
    if mem is not None:
        f += 2 * _mm(seq, dim, dim)                    # q, o
        if count_kv:
            f += 2 * _mm(mem, kv_dim or dim, dim)      # k, v
        f += 2 * 2.0 * seq * mem * dim                 # logits + probs@V
    f += _mm(seq, dim, ffn_mult * dim) + _mm(seq, ffn_mult * dim, dim)
    if adaln:
        n_sub = 3 if mem is not None else 2
        f += _mm(1, cond_dim or dim, 3 * n_sub * dim)
    return f


def duration_predictor_flops(cfg: TTSConfig, l_text: int) -> float:
    hp = cfg.duration_predictor
    n_style = cfg.dp.style.n_style
    f = _mm(n_style, cfg.dp.style.style_value_dim, hp.dim)
    f += hp.n_layers * _block(l_text, hp.dim, hp.ffn_mult, mem=n_style)
    f += _mm(1, hp.dim, hp.dim) + _mm(1, hp.dim, 1)    # pooled rate head
    return f


def text_encoder_flops(cfg: TTSConfig, l_text: int) -> float:
    hp = cfg.text_encoder
    n_style = cfg.ttl.style.n_style
    f = 2 * _mm(l_text, hp.conv_kernel * hp.dim, hp.dim)   # prenet convs
    f += _mm(n_style, cfg.ttl.style.style_value_dim, hp.dim)
    f += hp.n_layers * _block(l_text, hp.dim, hp.ffn_mult, mem=n_style)
    f += _mm(l_text, cfg.ttl.proj_out_idim, cfg.ttl.proj_out_odim)
    return f


def vector_estimator_flops(cfg: TTSConfig, l_text: int, t_latent: int,
                           total_step: int) -> float:
    hp = cfg.vector_estimator
    c_lat = cfg.latent_channels
    n_style = cfg.ttl.style.n_style
    mem = n_style + l_text
    per_step = _mm(t_latent, c_lat, hp.dim)
    per_step += _mm(1, hp.time_embed_dim, hp.dim) + _mm(1, hp.dim, hp.dim)
    per_step += hp.n_layers * _block(
        t_latent, hp.dim, hp.ffn_mult, mem=mem, adaln=True,
        cond_dim=hp.dim, count_kv=False)
    per_step += _mm(1, hp.dim, 2 * hp.dim)             # adaln_out
    per_step += _mm(t_latent, hp.dim, c_lat)           # out_proj
    # loop-invariant, LICM-hoisted: memory projections + cross K/V
    hoisted = _mm(l_text, cfg.ttl.proj_out_odim, hp.dim)   # text_proj
    hoisted += _mm(n_style, cfg.ttl.style.style_value_dim, hp.dim)
    hoisted += hp.n_layers * 2 * _mm(mem, hp.dim, hp.dim)  # k, v per block
    return total_step * per_step + hoisted


def vocoder_flops(cfg: TTSConfig, t_latent: int) -> float:
    hp = cfg.vocoder
    k = hp.resblock_kernel
    f = _mm(t_latent, 7 * cfg.latent_channels, hp.dim)       # pre conv
    f += len(hp.resblock_dilations) * 2 * _mm(t_latent, k * hp.dim, hp.dim)
    t, cin = float(t_latent), hp.dim
    for factor, cout in zip(hp.upsample_factors, hp.channels):
        f += _mm(t, hp.stage_kernel * cin, cout * factor)    # up conv
        t *= factor
        f += len(hp.resblock_dilations) * 2 * _mm(t, k * cout, cout)
        cin = cout
    f += _mm(t, 3 * cin, cfg.chunk_size // math.prod(hp.upsample_factors))
    return f


def fused_synthesis_flops(cfg: TTSConfig, batch: int, l_text: int,
                          t_latent: int, total_step: int) -> float:
    """Total FLOPs of one fused program dispatch at padded bucket shapes."""
    per_row = (duration_predictor_flops(cfg, l_text)
               + text_encoder_flops(cfg, l_text)
               + vector_estimator_flops(cfg, l_text, t_latent, total_step)
               + vocoder_flops(cfg, t_latent))
    return batch * per_row


def mfu(flops: float, seconds: float, chip: str = "v5e",
        n_chips: int = 1) -> tuple[float, float | None]:
    """(tflops_effective, mfu_fraction) for a measured wall time.
    mfu is None when the part's peak is unknown (e.g. CPU test runs) —
    None stays valid JSON where NaN would not."""
    tflops = flops / seconds / 1e12 / max(n_chips, 1)
    peak = PEAK_TFLOPS.get(chip)
    if peak is None or peak != peak:  # missing or NaN
        return tflops, None
    return tflops, tflops / peak
