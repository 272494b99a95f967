#!/usr/bin/env python
"""Bit-faithfulness harness: JAX ONNX executor vs ONNX Runtime on the real
graphs.

This is the BASELINE parity gate made executable (SURVEY.md §7.2 step 3:
"waveform allclose vs the ONNX oracle with injected identical noise"). Point
it at an assets directory holding the four reference graphs
(tools/fetch_assets.py) on a machine where ``onnxruntime`` is installed:

    python tools/parity_check.py --assets-dir ~/.cache/supertonic_tpu/assets

It then reports, per module and end-to-end:

  * duration_predictor / text_encoder outputs on identical frontend inputs,
  * per-denoise-step latents (the §2.2 noise-as-input design lets the SAME
    noise drive both stacks — py/helper.py:161-175),
  * vocoder waveforms,
  * the fused engine backend (assets/onnx_backend) against the per-call
    executor pipeline (always runnable, no onnxruntime needed).

Exit code 0 iff every stage is within tolerance. Without onnxruntime the
ORT comparison is skipped with a clear message (the self-check still runs);
this environment has no ORT and no real assets, so the mocked-session test
lives in tests/test_parity_check.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TEXTS = [
    ("This morning, I took a walk in the park.", "en"),
    ("Une phrase pour la parité, avec des accents.", "fr"),
    ("안녕하세요, 오늘 날씨가 좋네요.", "ko"),
]


def _stats(a, b) -> dict:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape:
        return {"shape_a": list(a.shape), "shape_b": list(b.shape),
                "max_abs": float("inf")}
    d = np.abs(a - b)
    denom = np.maximum(np.abs(b), 1e-6)
    return {"max_abs": float(d.max(initial=0.0)),
            "max_rel": float((d / denom).max(initial=0.0)),
            "rms": float(np.sqrt(np.mean(d * d))) if d.size else 0.0}


def _session_factory(kind: str):
    """Returns path -> session with an ORT-style .run(None, feeds)."""
    if kind == "ort":
        import onnxruntime as ort  # raises ImportError when absent

        return lambda p: ort.InferenceSession(
            p, providers=["CPUExecutionProvider"])
    if kind == "torch":
        return TorchOracleSession
    from supertonic_tpu.assets.onnx_exec import OnnxSession

    return lambda p: OnnxSession(p, matmul_precision="float32")


class TorchOracleSession:
    """Torch-eager second implementation: runs the TorchScript twin saved
    next to each graph (``<name>.pt``, tools/torch_export_bundle.py) behind
    the ORT session interface. This exercises the gate's full plumbing
    against a REAL independent runtime on machines without onnxruntime —
    the same oracle role py/helper.py:289-306 gives ORT."""

    def __init__(self, onnx_path: str):
        import torch

        from supertonic_tpu.assets.onnx_reader import load_onnx

        pt = onnx_path[: -len(".onnx")] + ".pt"
        if not os.path.exists(pt):
            raise FileNotFoundError(
                f"--torch-oracle needs {pt} beside {onnx_path} "
                "(generate with tools/torch_export_bundle.py)")
        self._torch = torch
        self.mod = torch.jit.load(pt).eval()
        g = load_onnx(onnx_path)
        self.names = [vi.name for vi in g.inputs
                      if vi.name not in g.initializers]

    def run(self, _outs, feeds):
        torch = self._torch
        with torch.no_grad():
            outs = self.mod(*[
                torch.from_numpy(np.ascontiguousarray(feeds[n]))
                for n in self.names])
        if isinstance(outs, torch.Tensor):
            outs = (outs,)
        return [o.numpy() for o in outs]


def compare_modules(assets_dir: str, make_ref, total_step: int,
                    tol: float) -> tuple[list[dict], bool]:
    """Per-module + end-to-end diffs: executor pipeline vs reference
    sessions on identical inputs, identical injected noise."""
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline

    pipe = load_onnx_pipeline(assets_dir, matmul_precision="float32")
    refs = {name: make_ref(os.path.join(assets_dir, f"{name}.onnx"))
            for name in ("duration_predictor", "text_encoder",
                         "vector_estimator", "vocoder")}
    rng = np.random.default_rng(0)
    rows: list[dict] = []
    ok = True
    style = _load_any_style(assets_dir, rng)

    for text, lang in TEXTS:
        ids, mask = pipe.processor([text], [lang])
        feeds = {"text_ids": ids.astype(np.int64), "style_dp": style["dp"],
                 "text_mask": mask.astype(np.float32)}
        (dur_ref,) = refs["duration_predictor"].run(None, feeds)
        (dur_got,) = pipe.dp.run(None, feeds)
        rows.append({"stage": "duration_predictor", "text": text[:24],
                     **_stats(dur_got, dur_ref)})

        feeds_te = {"text_ids": ids.astype(np.int64),
                    "style_ttl": style["ttl"],
                    "text_mask": mask.astype(np.float32)}
        (emb_ref,) = refs["text_encoder"].run(None, feeds_te)
        (emb_got,) = pipe.text_enc.run(None, feeds_te)
        rows.append({"stage": "text_encoder", "text": text[:24],
                     **_stats(emb_got, emb_ref)})

        dur = np.asarray(dur_ref, np.float32) / 1.05
        xt_noise = rng.standard_normal(
            (1, pipe.ldim * pipe.chunk_compress_factor,
             max(1, int(np.ceil(dur.max() * pipe.sample_rate
                                / (pipe.base_chunk_size
                                   * pipe.chunk_compress_factor)))))
        ).astype(np.float32)
        xt, lmask = pipe.sample_noisy_latent(dur, noise=xt_noise)
        xr = xt.copy()
        tot = np.full((1,), float(total_step), np.float32)
        for step in range(total_step):
            fe = {"text_emb": emb_ref, "style_ttl": style["ttl"],
                  "text_mask": mask.astype(np.float32), "latent_mask": lmask,
                  "current_step": np.full((1,), float(step), np.float32),
                  "total_step": tot}
            (xr,) = refs["vector_estimator"].run(
                None, dict(fe, noisy_latent=xr))
            (xt,) = pipe.vector_est.run(None, dict(fe, noisy_latent=xt))
            rows.append({"stage": f"vector_estimator[{step}]",
                         "text": text[:24], **_stats(xt, xr)})
        (wav_ref,) = refs["vocoder"].run(None, {"latent": xr})
        (wav_got,) = pipe.vocoder.run(None, {"latent": xr})
        rows.append({"stage": "vocoder", "text": text[:24],
                     **_stats(wav_got, wav_ref)})
        # estimator-chain end-to-end, SEEDED with ORT's dur/emb (isolates
        # estimator+vocoder accumulation from dp/encoder differences)
        rows.append({"stage": "seeded_end_to_end_wav", "text": text[:24],
                     **_stats(pipe.vocoder.run(None, {"latent": xt})[0],
                              wav_ref)})

        # TRUE full own chain: the executor's OWN dp -> encoder -> loop ->
        # vocoder against ORT's own chain, identical injected noise. Valid
        # elementwise only when both chains pick the same latent length —
        # a geometry divergence is itself a parity failure, reported as
        # max_abs = inf rather than silently skipped.
        dur_e = np.asarray(dur_got, np.float32) / 1.05
        chunk = pipe.base_chunk_size * pipe.chunk_compress_factor
        len_ref = int(np.ceil(dur.max() * pipe.sample_rate / chunk))
        len_e = int(np.ceil(dur_e.max() * pipe.sample_rate / chunk))
        if len_e != len_ref:
            rows.append({"stage": "full_own_chain_wav", "text": text[:24],
                         "max_abs": float("inf"), "max_rel": float("inf"),
                         "rms": float("inf"),
                         "note": f"latent geometry diverged "
                                 f"({len_e} vs {len_ref} frames)"})
        else:
            xt_e, lmask_e = pipe.sample_noisy_latent(
                dur_e, noise=xt_noise)
            for step in range(total_step):
                (xt_e,) = pipe.vector_est.run(None, {
                    "noisy_latent": xt_e, "text_emb": emb_got,
                    "style_ttl": style["ttl"],
                    "text_mask": mask.astype(np.float32),
                    "latent_mask": lmask_e,
                    "current_step": np.full((1,), float(step), np.float32),
                    "total_step": tot})
            rows.append({"stage": "full_own_chain_wav", "text": text[:24],
                         **_stats(pipe.vocoder.run(None, {"latent": xt_e})[0],
                                  wav_ref)})
    for r in rows:
        r["ok"] = r["max_abs"] <= tol
        ok &= r["ok"]
    return rows, ok


def compare_fused_backend(assets_dir: str, total_step: int,
                          tol: float) -> tuple[list[dict], bool]:
    """Engine fused backend vs per-call executor pipeline — same injected
    noise (self-consistency; runs with no onnxruntime)."""
    import json as _json

    from supertonic_tpu.assets.onnx_backend import load_onnx_backend
    from supertonic_tpu.config import load_tts_json
    from supertonic_tpu.assets.onnx_pipeline import load_onnx_pipeline
    from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
    from supertonic_tpu.frontend import UnicodeProcessor

    cfg = load_tts_json(os.path.join(assets_dir, "tts.json"))
    with open(os.path.join(assets_dir, "unicode_indexer.json")) as f:
        proc = UnicodeProcessor(np.asarray(_json.load(f), np.int64))
    backend = load_onnx_backend(assets_dir, cfg, matmul_precision="float32",
                                bf16_storage=False)  # strict parity arm
    eng = SynthesisEngine(backend.params, cfg, proc, precision="f32",
                          backend=backend)
    pipe = load_onnx_pipeline(assets_dir, matmul_precision="float32")
    rng = np.random.default_rng(0)
    style_np = _load_any_style(assets_dir, rng)
    style = VoiceStyle(style_np["ttl"], style_np["dp"])
    rows: list[dict] = []
    ok = True
    for text, lang in TEXTS:
        ids, mask = pipe.processor([text], [lang])
        (d0,) = pipe.dp.run(None, {
            "text_ids": ids.astype(np.int64),
            "style_dp": style.dp,
            "text_mask": mask.astype(np.float32),
        })
        dur = np.asarray(d0, np.float32) / 1.05
        chunk = pipe.base_chunk_size * pipe.chunk_compress_factor
        t_lat = max(1, int(np.ceil(dur.max() * pipe.sample_rate / chunk)))
        c = pipe.ldim * pipe.chunk_compress_factor
        noise = rng.standard_normal((1, c, t_lat)).astype(np.float32)
        wav_pipe, dur_pipe = pipe._infer([text], [lang], style, total_step,
                                         noise=noise)
        wav_eng, dur_eng = eng.infer_batch([text], [lang], style, total_step,
                                           noise=noise.transpose(0, 2, 1))
        n = min(wav_pipe.shape[1], wav_eng.shape[1])
        rows.append({"stage": "fused_vs_pipeline_wav", "text": text[:24],
                     **_stats(wav_eng[:, :n], wav_pipe[:, :n])})
        rows.append({"stage": "fused_vs_pipeline_dur", "text": text[:24],
                     **_stats(dur_eng, dur_pipe)})
    for r in rows:
        r["ok"] = r["max_abs"] <= tol
        ok &= r["ok"]
    return rows, ok


def compare_padded_vocoder(assets_dir: str) -> tuple[list[dict], bool]:
    """Padded-vs-exact vocoder execution must be BIT-identical (ADVICE r4).

    The executor's bucket-padding halo guard (_apply_time_mask) re-zeroes
    padded frames after every conv; the guarantee additionally relies on
    every op between convs mapping 0 -> 0. That zero-preservation property
    is graph-dependent, so validate it HERE on the actual bundle being
    served rather than assuming it: run the vocoder at exact length T and
    again bucket-padded to T+pad with a [T+pad] validity mask, and require
    the valid prefix of the waveforms to match bit-for-bit. A future graph
    with a non-zero-preserving inter-conv op (Softplus, Sigmoid output,
    Add-with-constant) fails this gate instead of shipping a halo."""
    import json as _json

    from supertonic_tpu.assets.onnx_exec import OnnxSession

    with open(os.path.join(assets_dir, "tts.json")) as f:
        cfg = _json.load(f)
    ccf = int(cfg["ttl"]["chunk_compress_factor"])
    c = int(cfg["ttl"]["latent_dim"]) * ccf
    chunk = int(cfg["ae"]["base_chunk_size"]) * ccf
    exe = OnnxSession(os.path.join(assets_dir, "vocoder.onnx"),
                      matmul_precision="float32")
    rng = np.random.default_rng(7)
    rows, ok = [], True
    for t, pad in ((24, 8), (40, 24)):
        lat = rng.standard_normal((1, c, t)).astype(np.float32)
        (wav_exact,) = exe._run_traced(
            exe._weights, (jnp_asarray(lat),),
            np.ones((t,), np.float32))
        lat_pad = np.concatenate(
            [lat, np.zeros((1, c, pad), np.float32)], axis=2)
        mask = np.concatenate(
            [np.ones((t,), np.float32), np.zeros((pad,), np.float32)])
        (wav_pad,) = exe._run_traced(exe._weights, (jnp_asarray(lat_pad),),
                                     mask)
        a = np.asarray(wav_exact).reshape(1, -1)[:, : t * chunk]
        b = np.asarray(wav_pad).reshape(1, -1)[:, : t * chunk]
        row = {"stage": "padded_vs_exact_vocoder", "t": t, "pad": pad,
               **_stats(b, a)}
        row["ok"] = row["max_abs"] == 0.0  # bit-identical, not allclose
        ok &= row["ok"]
        rows.append(row)
    return rows, ok


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def _load_any_style(assets_dir: str, rng) -> dict:
    """A real voice style when the bundle has one, else deterministic
    random with the tts.json dims (shape-compatible with the graphs only
    when those carry the real config — fine for synthetic test bundles)."""
    import glob
    import json as _json

    for p in sorted(glob.glob(os.path.join(assets_dir, "voice_styles",
                                           "*.json"))):
        with open(p) as f:
            raw = _json.load(f)
        return {
            "ttl": np.asarray(raw["style_ttl"]["data"], np.float32).reshape(
                raw["style_ttl"]["dims"]),
            "dp": np.asarray(raw["style_dp"]["data"], np.float32).reshape(
                raw["style_dp"]["dims"]),
        }
    with open(os.path.join(assets_dir, "tts.json")) as f:
        cfgs = _json.load(f)
    try:
        ttl_s = cfgs["ttl"]["style_encoder"]["style_token_layer"]
        dp_s = cfgs["dp"]["style_encoder"]["style_token_layer"]
        ttl_shape = (1, ttl_s["n_style"], ttl_s["style_value_dim"])
        dp_shape = (1, dp_s["n_style"], dp_s["style_value_dim"])
    except KeyError:
        ttl_shape = dp_shape = (1, 2, 4)  # synthetic-bundle fallback
    return {"ttl": rng.standard_normal(ttl_shape).astype(np.float32),
            "dp": rng.standard_normal(dp_shape).astype(np.float32)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--assets-dir", required=True)
    ap.add_argument("--total-step", type=int, default=5)
    ap.add_argument("--tol", type=float, default=2e-4,
                    help="max |diff| gate (f32 matmul reassociation slack)")
    ap.add_argument("--skip-ort", action="store_true",
                    help="only run the fused-backend self-check")
    ap.add_argument("--torch-oracle", action="store_true",
                    help="compare against the TorchScript twins saved next "
                         "to each graph instead of onnxruntime "
                         "(tools/torch_export_bundle.py bundles)")
    args = ap.parse_args(argv)

    from supertonic_tpu.utils.jaxenv import force_cpu, setup_compilation_cache

    force_cpu()  # ORT oracle is CPU; compare like-for-like f32
    setup_compilation_cache()  # executor jits persist across gate runs

    all_ok = True
    rows: list[dict] = []
    if not args.skip_ort:
        if args.torch_oracle:
            make_ref = _session_factory("torch")
        else:
            try:
                make_ref = _session_factory("ort")
            except ImportError:
                print("onnxruntime not installed — skipping the ORT oracle "
                      "comparison (run on a machine with onnxruntime for "
                      "the full parity gate, or use --torch-oracle on a "
                      "torch_export_bundle). Self-check continues.",
                      file=sys.stderr)
                make_ref = None
        if make_ref is not None:
            r, ok = compare_modules(args.assets_dir, make_ref,
                                    args.total_step, args.tol)
            rows += r
            all_ok &= ok
    r, ok = compare_fused_backend(args.assets_dir, args.total_step, args.tol)
    rows += r
    all_ok &= ok
    r, ok = compare_padded_vocoder(args.assets_dir)
    rows += r
    all_ok &= ok
    for row in rows:
        print(json.dumps(row))
    print(json.dumps({"parity_ok": bool(all_ok), "stages": len(rows),
                      "tol": args.tol}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
