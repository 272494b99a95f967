#!/usr/bin/env python
"""A/B microbenchmark for the acoustic stage (flow loop + vocoder) on the TPU.

Times the full fused acoustic program at the serving shape (default b64,
T=256, 5 steps) for a set of variants:

    bf16   — current production path
    int8   — W8A8 estimator-block matmuls (models.quantize_params)
    f32    — parity path (reference-strict matmuls)

Usage:  python tools/microbench_step.py [--batch 64] [--t 256] [--steps 5]
        [--variants bf16,int8] [--iters 20] [--estimator-only]

Prints per-variant mean ms (one back-to-back dispatch window) per program and the audio-sec/s/chip implied at
that shape. This is the measurement harness behind docs/PERFORMANCE.md's
kernel A/B table.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=256, help="latent frames")
    ap.add_argument("--l", type=int, default=128, help="text bucket")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="bf16,int8")
    ap.add_argument("--estimator-only", action="store_true",
                    help="time one estimator step instead of the full stage")
    ap.add_argument("--vocoder-only", action="store_true",
                    help="time the vocoder alone (latent [B,T,C] -> wav)")
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler device trace of the "
                         "timed window into this directory")
    args = ap.parse_args()

    from supertonic_tpu.config import TTSConfig
    from supertonic_tpu.engine import synthesis
    from supertonic_tpu.models import init_all, quantize_params, vector_estimator

    cfg = TTSConfig()
    base_params = init_all(0, cfg)
    rng = np.random.default_rng(0)

    b, T, L = args.batch, args.t, args.l
    emb = jnp.asarray(
        rng.standard_normal((b, L, cfg.ttl.proj_out_odim)), jnp.float32)
    sttl = jnp.asarray(
        rng.standard_normal(
            (b, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)),
        jnp.float32)
    tmask = jnp.ones((b, L), jnp.float32)
    lmask = jnp.ones((b, T), jnp.float32)
    noise = jnp.asarray(
        rng.standard_normal((b, T, cfg.latent_channels)), jnp.float32)

    audio_sec = b * T * cfg.chunk_size / cfg.sample_rate

    results = {}
    for variant in args.variants.split(","):
        variant = variant.strip()
        if variant == "int8":
            params = jax.tree_util.tree_map(
                jnp.asarray, quantize_params(base_params))
            precision = "int8"
        elif variant == "bf16w":
            # bf16 WEIGHT STORAGE: cast every >=2-D leaf (matmul/conv
            # weights) to bf16 on the host; 1-D leaves (biases, norm
            # gains) stay f32. In bf16 activation mode this is bit-
            # identical to the f32-stored path (the graph casts w to
            # x.dtype at use anyway) but halves the per-step HBM->VMEM
            # weight traffic the estimator trace showed on the critical
            # path (~3.8 ms of the 7.9 ms step).
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.bfloat16)
                if getattr(a, "ndim", 0) >= 2 else jnp.asarray(a),
                base_params)
            precision = "bf16"
        else:
            params = jax.tree_util.tree_map(jnp.asarray, base_params)
            precision = variant

        if args.vocoder_only:
            from supertonic_tpu.models import vocoder as _voc

            dtype = jnp.float32 if precision == "f32" else jnp.bfloat16
            fmask = jnp.ones((T,), jnp.float32)

            @jax.jit
            def vfn(p, x, fm):
                return _voc.apply(p, cfg, x, frame_mask=fm, dtype=dtype)

            run = functools.partial(vfn, params["vocoder"], noise, fmask)
        elif args.estimator_only:
            dtype = jnp.float32 if precision == "f32" else jnp.bfloat16
            cur = jnp.zeros((b,), jnp.float32)
            tot = jnp.full((b,), float(args.steps), jnp.float32)

            # activations are jit ARGUMENTS: closing over emb (~17 MB)
            # would bake it into the HLO as constants — huge programs,
            # slow remote compiles, no cache reuse (same rule as params)
            @jax.jit
            def fn(p, x, e, st, tm, lm):
                return vector_estimator.step(
                    p["vector_estimator"], cfg, x, e, st, tm, lm,
                    cur, tot, dtype=dtype)

            run = functools.partial(fn, params, noise, emb, sttl, tmask,
                                    lmask)
        else:
            stage = synthesis.jit_acoustic_stage(cfg, precision=precision)
            run = functools.partial(
                stage, params, emb, sttl, tmask, lmask, noise, args.steps)

        def fetch_scalar(o):
            # force real remote execution: through the axon tunnel,
            # block_until_ready returns before the device finishes — only an
            # actual value fetch (8 bytes, ~35 ms RTT, amortized over iters)
            # truly syncs. Device executes dispatches in order, so syncing
            # the last one fences the whole pipeline.
            arr = o if not isinstance(o, tuple) else o[0]
            return float(jnp.sum(arr.astype(jnp.float32)))

        print(f"# compiling {variant} ...", file=sys.stderr, flush=True)
        out = run()
        fetch_scalar(out)
        # steady-state device time: dispatch all iters back-to-back and sync
        # ONCE — a per-iteration sync would measure the ~35 ms tunnel RTT,
        # not the chip (cf. bench.harness.bench_batch_throughput)
        import contextlib

        trace_ctx = contextlib.nullcontext()
        if args.trace_dir:
            from supertonic_tpu.utils.timing import device_trace
            trace_ctx = device_trace(f"{args.trace_dir}/{variant}")
        with trace_ctx:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = run()
            fetch_scalar(out)
            avg = (time.perf_counter() - t0) / args.iters
        results[variant] = avg
        label = ("voc" if args.vocoder_only
                 else "step" if args.estimator_only else "stage")
        extra = "" if args.estimator_only else (
            f"  ({audio_sec / avg:.0f} audio-sec/s at this shape)")
        print(f"{variant:>6}: {avg * 1e3:8.2f} ms/{label} (mean over one "
              f"back-to-back window){extra}", flush=True)

    if "bf16" in results:
        for v, t in results.items():
            if v != "bf16":
                print(f"# {v} vs bf16: {results['bf16'] / t:.2f}x")


if __name__ == "__main__":
    main()
