#!/usr/bin/env python
"""Settle the int8 question (VERDICT r3 item 4): can ANY lowering on this
jax/XLA/libtpu stack engage the MXU's 2x int8 mode?

Round-2/3 finding (docs/PERFORMANCE.md): W8A8 estimator matmuls measured
NEUTRAL — an isolated [16384,512]x[512,2048] dot hit ~118 TFLOP/s in BOTH
int8 and bf16, i.e. XLA executed the integer dot at bf16-equivalent rate
instead of the nameplate ~2x. This tool tries the candidate lowerings:

    bf16      jnp.dot(bf16, bf16, preferred_element_type=f32)   [baseline]
    i8_i32    lax.dot_general(int8, int8, preferred_element_type=int32)
    i8_f32    lax.dot_general(int8, int8, preferred_element_type=f32)
    i8_pallas Mosaic kernel: jnp.dot(int8-tile, int8-tile, -> int32 acc)
              — bypasses XLA's dot lowering entirely; if THIS does not
              exceed the bf16 rate, the 2x path is not reachable on this
              stack (compiler/runtime, not model code)

and prints TFLOP/s for each plus the compiled HLO op name for the XLA
variants, so the conclusion can be pinned with an exact citation.

Usage: python tools/int8_microbench.py [--m 16384] [--k 512] [--n 2048]
       [--iters 200] [--hlo]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

from supertonic_tpu.utils.jaxenv import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pallas_i8_matmul(a, b, *, tile_m=512, tile_n=512):
    """Plain tiled matmul kernel with int8 inputs / int32 accumulation.
    K stays unblocked (fits VMEM at the probed shapes)."""
    m, k = a.shape
    _, n = b.shape

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    return pl.pallas_call(
        kern,
        grid=(m // tile_m, n // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
    )(a, b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--hlo", action="store_true",
                    help="print the compiled HLO dot/convert ops")
    ap.add_argument("--variants",
                    default="bf16,i8_i32,i8_f32,i8_pallas")
    args = ap.parse_args()
    m, k, n = args.m, args.k, args.n
    flops = 2.0 * m * k * n

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
    abf = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

    dn = (((1,), (0,)), ((), ()))
    variants = {
        "bf16": (lambda x, y: jnp.dot(x, y,
                                      preferred_element_type=jnp.float32),
                 abf, bbf),
        "i8_i32": (lambda x, y: jax.lax.dot_general(
            x, y, dn, preferred_element_type=jnp.int32), a8, b8),
        "i8_f32": (lambda x, y: jax.lax.dot_general(
            x, y, dn, preferred_element_type=jnp.float32), a8, b8),
        "i8_pallas": (_pallas_i8_matmul, a8, b8),
    }

    for name in args.variants.split(","):
        fn, x, y = variants[name.strip()]
        jfn = jax.jit(fn)
        if args.hlo and name != "i8_pallas":
            txt = jfn.lower(x, y).compile().as_text()
            dots = [ln.strip() for ln in txt.splitlines()
                    if "dot(" in ln or " = s32[" in ln or "convert(" in ln]
            print(f"# --- {name} compiled HLO (dot/convert lines) ---")
            for ln in dots[:8]:
                print(f"#   {ln[:160]}")
        print(f"# compiling {name} ...", file=sys.stderr, flush=True)
        out = jfn(x, y)
        # fence through the tunnel: fetch a real value (block_until_ready
        # returns before remote execution completes on this harness)
        float(jnp.sum(out[:1, :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(x, y)
        float(jnp.sum(out[:1, :1].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>10}: {dt*1e6:9.1f} us  {flops/dt/1e12:7.2f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
