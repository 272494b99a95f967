"""Pallas fused dilated-resblock chain for the vocoder's fine timelines.

The vocoder's upsampled stages are the one part of the pipeline XLA cannot
fuse well: a resblock chain is 2*len(dilations) separate convolutions, and
every conv HLO materializes its input AND output through HBM. At the finest
timeline ([B, T*64, 128] for the default config — ~268 MB bf16 at b64/T256)
that is ~12 full HBM round-trips over the largest activation in the model,
which is why the vocoder stage measured ~55-60% of the chip's practical
roofline while the flow loop sits at 87% (docs/PERFORMANCE.md).

This kernel runs the WHOLE chain over a (batch row, timeline tile) window
held in VMEM: read the tile once (with a halo = the chain's receptive
field), apply every silu+conv+mask+residual in registers/VMEM, write the
tile once. Each k-tap dilated conv is computed as k shifted [T, C] @ [C, C]
matmuls — the exact contraction the MXU wants at C >= 128 (models/vocoder.py
keeps all fine-timeline channels lane-friendly by design).

Halo correctness: the buffer is loaded with H extra frames on each side
(H = one-sided receptive field of the chain, exact values from the
globally-padded input). Each conv's edge outputs inside the buffer are
garbage (shifted reads run off the window), but the garbage frontier
advances inward by exactly that conv's reach, so after the full chain the
central t_blk frames are EXACT — the same receptive-field-halo argument
behind windowed streaming (models/vocoder.receptive_field_frames).

Numerics match the XLA path op-for-op (silu in the storage dtype, conv
accumulation in f32 via preferred_element_type, bias add in f32, cast to
storage dtype, then the 0/1 frame-mask multiply, residual add in storage
dtype); parity is pinned by tests/test_vocoder_fused.py in interpret mode
and the sum order inside a conv (3 shifted matmuls vs XLA's conv lowering)
is the only difference — bit-level for mask zeros, ~1 ulp otherwise.

Reference anchor: the vocoder graph this replaces is served whole by ORT in
the reference (py/helper.py:214); the fusion is purely an execution-speed
choice with identical module semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_halo(kernel: int, dilations) -> int:
    """One-sided receptive field of the dilated(a)+plain(b) conv chain."""
    half = (kernel - 1) // 2
    return sum(d * half + half for d in dilations)


def _kernel(x_hbm, mask_ref, wa_ref, ba_ref, wb_ref, bb_ref, out_ref,
            buf, sem, *, dilations, t_blk: int, halo: int):
    t = pl.program_id(1)
    t_buf = t_blk + 2 * halo
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(t * t_blk, t_buf), :], buf, sem)
    cp.start()
    cp.wait()
    x = buf[:]                                     # [t_buf, C] storage dtype
    dt = x.dtype
    c = x.shape[-1]
    k = wa_ref.shape[1]
    zeros = jnp.zeros((max(dilations) * ((k - 1) // 2), c), dt)
    # validity mask over the buffer window: the caller's frame mask AND the
    # global sequence bounds. Multiplying after EVERY conv both reproduces
    # the frame-mask semantics of models.vocoder._resblock and re-zeroes
    # out-of-sequence halo frames exactly where XLA's SAME padding would
    # read zeros — without it, bias-shifted halo values would diverge from
    # the unfused path at the sequence edges.
    m = mask_ref[pl.ds(t * t_blk, t_buf), :].astype(dt)      # [t_buf, 1]

    def shift(v, s: int):
        # static shift with zero fill: edge garbage stays inside the
        # advancing halo frontier (see module docstring)
        if s == 0:
            return v
        if s > 0:
            return jnp.concatenate([v[s:], zeros[:s]], axis=0)
        return jnp.concatenate([zeros[:-s], v[:s]], axis=0)

    def conv(v, w_ref, b_ref, i: int, d: int):
        acc = b_ref[i, :].astype(jnp.float32)[None, :]
        for tap in range(w_ref.shape[1]):
            off = (tap - (w_ref.shape[1] - 1) // 2) * d
            acc = acc + jnp.dot(shift(v, off), w_ref[i, tap].astype(dt),
                                preferred_element_type=jnp.float32)
        return acc.astype(dt) * m

    def silu(v):
        # explicit f32 transcendental + round back to storage dtype:
        # jax.nn.silu on a bf16 operand trips a Mosaic verifier bug on TPU
        # ('vector.broadcast' f32->bf16 element-type mismatch inside the
        # logistic lowering); XLA's own bf16 silu also evaluates the
        # sigmoid in f32 and rounds, so numerics are unchanged.
        vf = v.astype(jnp.float32)
        return (vf * jax.lax.logistic(vf)).astype(dt)

    for i, d in enumerate(dilations):
        h = conv(silu(x), wa_ref, ba_ref, i, d)
        h = conv(silu(h), wb_ref, bb_ref, i, 1)
        x = x + h

    out_ref[0] = x[halo:halo + t_blk]


@functools.partial(jax.jit, static_argnames=("dilations", "t_blk"))
def resblock_chain(x: jax.Array,                 # [B, T, C]
                   frame_mask: jax.Array | None,  # [T] (1 = real frame)
                   wa: jax.Array,                # [P, k, C, C] dilated convs
                   ba: jax.Array,                # [P, C]
                   wb: jax.Array,                # [P, k, C, C] plain convs
                   bb: jax.Array,                # [P, C]
                   *, dilations: tuple[int, ...],
                   t_blk: int = 1024) -> jax.Array:
    """Fused equivalent of models.vocoder._resblock (same params/mask
    semantics). Returns [B, T, C] in x.dtype."""
    b_sz, t_len, c = x.shape
    k = wa.shape[1]
    halo = chain_halo(k, dilations)
    blk = min(t_blk, _round_up(t_len, 16))  # bf16 sublane tile = 16
    t_pad = _round_up(t_len, blk)
    x_p = jnp.pad(x, ((0, 0), (halo, t_pad - t_len + halo), (0, 0)))
    # validity = caller's frame mask (ones if None) zero-padded to the
    # buffer bounds — the zero padding doubles as XLA-SAME-pad equivalence
    # at the sequence edges (see _kernel)
    fm = (jnp.ones((t_len,), jnp.float32) if frame_mask is None
          else frame_mask.astype(jnp.float32))
    m_p = jnp.pad(fm, (halo, t_pad - t_len + halo))[:, None]
    dtw = x.dtype
    grid = (b_sz, t_pad // blk)
    const = lambda bi, ti: (0, 0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, dilations=dilations, t_blk=blk,
                          halo=halo),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x (manual DMA)
            pl.BlockSpec(m_p.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),         # padded mask
            pl.BlockSpec(wa.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(ba.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wb.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(bb.shape, lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_sz, t_pad, c), dtw),
        scratch_shapes=[
            pltpu.VMEM((blk + 2 * halo, c), dtw),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x_p, m_p, wa.astype(dtw), ba, wb.astype(dtw), bb)
    return out[:, :t_len]


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def stack_resblock(params: dict) -> tuple[jax.Array, ...]:
    """Stack a models.vocoder resblock param dict ({"convs": [{"a": {w,b},
    "b": {w,b}}, ...]}) into the kernel's [P, k, C, C] / [P, C] layout."""
    wa = jnp.stack([jnp.asarray(cp["a"]["w"]) for cp in params["convs"]])
    ba = jnp.stack([jnp.asarray(cp["a"]["b"]) for cp in params["convs"]])
    wb = jnp.stack([jnp.asarray(cp["b"]["w"]) for cp in params["convs"]])
    bb = jnp.stack([jnp.asarray(cp["b"]["b"]) for cp in params["convs"]])
    return wa, ba, wb, bb


def fused_resblock(params: dict, x: jax.Array, dilations,
                   mask: jax.Array | None = None,
                   *, t_blk: int = 1024) -> jax.Array:
    """Drop-in for models.vocoder._resblock(params, x, dilations, mask).

    ``mask`` here is the broadcastable [1, T, 1] (or None) the vocoder
    carries; only the shared-frame form (same mask for every batch row) is
    fusable — per-row masks fall back to the caller's XLA path."""
    wa, ba, wb, bb = stack_resblock(params)
    fm = None
    if mask is not None:
        fm = mask.reshape(mask.shape[-2])  # [1, T, 1] -> [T]
    return resblock_chain(x, fm, wa, ba, wb, bb,
                          dilations=tuple(int(d) for d in dilations),
                          t_blk=t_blk)
