#!/usr/bin/env python
"""Export a mini 4-graph TTS bundle with torch.onnx.export (foreign bytes).

Every other ONNX fixture in this repo is produced by the in-repo protobuf
writer; this tool produces a complete reference-layout bundle whose graph
bytes come from the OFFICIAL torch exporter (the TorchScript path works
offline), so the reader + executor + pipeline are exercised end-to-end
against a protobuf encoder we did not write. The four networks carry the
exact reference I/O contract (SURVEY.md §2.2; reference py/helper.py:177-215):

  duration_predictor(text_ids i64 [B,L], style_dp f32 [B,S,D],
                     text_mask f32 [B,1,L]) -> duration f32 [B]
  text_encoder(text_ids, style_ttl, text_mask) -> text_emb f32 [B,E,L]
  vector_estimator(noisy_latent f32 [B,C,T], text_emb, style_ttl, text_mask,
                   latent_mask f32 [B,1,T], current_step f32 [B],
                   total_step f32 [B]) -> denoised_latent (Euler step INSIDE)
  vocoder(latent f32 [B,C,T]) -> wav_tts f32 [B, T*chunk]

Alongside each ``<name>.onnx`` a traced TorchScript twin ``<name>.pt`` is
saved: ``tools/parity_check.py --torch-oracle`` runs the gate with torch
eager as the second implementation (the same role onnxruntime plays on a
machine that has it — reference oracle per py/helper.py:289-306).

Usage:  python tools/torch_export_bundle.py --out-dir /tmp/torch_bundle
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# mini model geometry (same scale as tests/test_onnx_pipeline.py so latent
# grids stay small under CPU tests)
SR = 80
BASE_CHUNK = 4
CCF = 2
LDIM = 3
C = LDIM * CCF          # latent channels
E = 16                  # embedding width
V = 128                 # vocab
N_STYLE, STYLE_DIM = 2, 4
CHUNK = BASE_CHUNK * CCF


def export_onnx(model, args, path: str, *, input_names, output_names,
                dynamic_axes, opset: int = 17) -> None:
    """torch.onnx.export via the offline TorchScript path.

    The exporter's last step (_add_onnxscript_fn) only parses-and-reserializes
    the proto to inject custom onnxscript functions — there are none for
    standard aten ops — but it unconditionally imports the ``onnx`` package,
    which this environment does not have. Bypassing it leaves the bytes
    exactly as torch's C++ protobuf encoder produced them.
    """
    import torch
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = \
        lambda model_bytes, custom_opsets: model_bytes
    try:
        torch.onnx.export(
            model, args, path, input_names=list(input_names),
            output_names=list(output_names), dynamic_axes=dynamic_axes,
            opset_version=opset, dynamo=False)
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def build_modules(seed: int = 0):
    """The four torch networks, freshly initialized from ``seed``."""
    import torch
    from torch import nn

    torch.manual_seed(seed)

    class MiniDurationPredictor(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(V, E)
            self.proj = nn.Linear(E + STYLE_DIM, E)
            self.out = nn.Linear(E, 1)

        def forward(self, text_ids, style_dp, text_mask):
            h = self.emb(text_ids)                       # B,L,E
            m = text_mask.transpose(1, 2)                # B,L,1
            pooled = (h * m).sum(1) / m.sum(1)           # masked mean: B,E
            z = torch.cat([pooled, style_dp.mean(1)], dim=-1)
            z = torch.tanh(self.proj(z))
            base = nn.functional.softplus(self.out(z)).squeeze(-1)
            # longer text -> longer duration, so latent geometry depends on
            # the input like the real model's does
            return base + 0.5 + 0.02 * m.sum(dim=(1, 2))

    class MiniTextEncoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(V, E)
            self.conv = nn.Conv1d(E, E, 3, padding=1)
            self.style_proj = nn.Linear(STYLE_DIM, E)

        def forward(self, text_ids, style_ttl, text_mask):
            h = self.emb(text_ids).transpose(1, 2) * text_mask   # B,E,L
            h = torch.nn.functional.gelu(self.conv(h))
            s = self.style_proj(style_ttl.mean(1)).unsqueeze(-1)
            # mask LAST: padded positions exactly zero (padding-invariant,
            # like the real mask-driven graphs — SURVEY.md §2.2)
            return (h + s) * text_mask

    class MiniVectorEstimator(nn.Module):
        """Masked cross-attention latent->text + time conditioning, with the
        flow-matching Euler update INSIDE the graph (§2.2 critical
        semantics: the graph returns the NEXT latent, not a velocity)."""

        def __init__(self):
            super().__init__()
            self.q = nn.Conv1d(C, E, 1)
            self.k = nn.Linear(E, E)
            self.v = nn.Linear(E, E)
            self.time = nn.Linear(2, E)
            self.out = nn.Conv1d(E, C, 1)

        def forward(self, noisy_latent, text_emb, style_ttl, text_mask,
                    latent_mask, current_step, total_step):
            q = self.q(noisy_latent).transpose(1, 2)     # B,T,E
            kv = text_emb.transpose(1, 2)                # B,L,E
            att = q @ self.k(kv).transpose(1, 2) / math.sqrt(E)  # B,T,L
            att = att + (text_mask - 1.0) * 1e4          # exact masked softmax
            ctx = att.softmax(-1) @ self.v(kv)           # B,T,E
            t = torch.stack([current_step / total_step,
                             1.0 / total_step], dim=-1)  # B,2
            s = style_ttl.mean(dim=(1, 2)).reshape(-1, 1, 1)
            ctx = torch.tanh(ctx + self.time(t).unsqueeze(1) + s)
            vel = self.out(ctx.transpose(1, 2)) * latent_mask
            dt = (1.0 / total_step).reshape(-1, 1, 1)
            return noisy_latent + vel * dt

    class MiniVocoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.pre = nn.Conv1d(C, C, 3, padding=1)
            self.up = nn.ConvTranspose1d(C, 1, CHUNK, stride=CHUNK)

        def forward(self, latent):
            h = torch.tanh(self.pre(latent))
            return torch.tanh(self.up(h)).squeeze(1)     # B, T*CHUNK

    return {
        "duration_predictor": MiniDurationPredictor().eval(),
        "text_encoder": MiniTextEncoder().eval(),
        "vector_estimator": MiniVectorEstimator().eval(),
        "vocoder": MiniVocoder().eval(),
    }


def example_feeds(bsz: int = 2, L: int = 11, T: int = 9):
    """Example tensors at the §2.2 contract shapes (for export tracing)."""
    import torch

    g = torch.Generator().manual_seed(1)
    ids = torch.randint(1, V, (bsz, L), generator=g, dtype=torch.int64)
    mask = torch.ones(bsz, 1, L)
    if bsz > 1:
        mask[1:, :, L - 2:] = 0.0
        ids = ids * mask[:, 0, :].to(torch.int64)
    return {
        "text_ids": ids,
        "style_dp": torch.randn(bsz, N_STYLE, STYLE_DIM, generator=g),
        "style_ttl": torch.randn(bsz, N_STYLE, STYLE_DIM, generator=g),
        "text_mask": mask,
        "noisy_latent": torch.randn(bsz, C, T, generator=g),
        "text_emb": torch.randn(bsz, E, L, generator=g),
        "latent_mask": torch.ones(bsz, 1, T),
        "current_step": torch.zeros(bsz),
        "total_step": torch.full((bsz,), 4.0),
        "latent": torch.randn(bsz, C, T, generator=g),
    }


# per-graph (input names, output names, dynamic axes) — the §2.2 contract
CONTRACT = {
    "duration_predictor": (
        ("text_ids", "style_dp", "text_mask"), ("duration",),
        {"text_ids": {0: "B", 1: "L"}, "style_dp": {0: "B"},
         "text_mask": {0: "B", 2: "L"}, "duration": {0: "B"}}),
    "text_encoder": (
        ("text_ids", "style_ttl", "text_mask"), ("text_emb",),
        {"text_ids": {0: "B", 1: "L"}, "style_ttl": {0: "B"},
         "text_mask": {0: "B", 2: "L"}, "text_emb": {0: "B", 2: "L"}}),
    "vector_estimator": (
        ("noisy_latent", "text_emb", "style_ttl", "text_mask",
         "latent_mask", "current_step", "total_step"),
        ("denoised_latent",),
        {"noisy_latent": {0: "B", 2: "T"}, "text_emb": {0: "B", 2: "L"},
         "style_ttl": {0: "B"}, "text_mask": {0: "B", 2: "L"},
         "latent_mask": {0: "B", 2: "T"}, "current_step": {0: "B"},
         "total_step": {0: "B"}, "denoised_latent": {0: "B", 2: "T"}}),
    "vocoder": (
        ("latent",), ("wav_tts",),
        {"latent": {0: "B", 2: "T"}, "wav_tts": {0: "B", 1: "W"}}),
}


def export_bundle(out_dir: str, *, seed: int = 0,
                  save_torch_oracle: bool = True) -> dict:
    """Write the full reference-layout bundle; returns the torch modules."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    mods = build_modules(seed)
    feeds = example_feeds()
    for name, mod in mods.items():
        in_names, out_names, dyn = CONTRACT[name]
        args = tuple(feeds[n] for n in in_names)
        export_onnx(mod, args, os.path.join(out_dir, f"{name}.onnx"),
                    input_names=in_names, output_names=out_names,
                    dynamic_axes=dyn)
        if save_torch_oracle:
            with torch.no_grad():
                traced = torch.jit.trace(mod, args)
            torch.jit.save(traced, os.path.join(out_dir, f"{name}.pt"))

    with open(os.path.join(out_dir, "tts.json"), "w") as f:
        json.dump({
            "ae": {"sample_rate": SR, "base_chunk_size": BASE_CHUNK},
            "ttl": {"chunk_compress_factor": CCF, "latent_dim": LDIM,
                    "style_encoder": {"style_token_layer": {
                        "n_style": N_STYLE, "style_value_dim": STYLE_DIM}}},
            "dp": {"latent_dim": LDIM, "chunk_compress_factor": CCF,
                   "style_encoder": {"style_token_layer": {
                       "n_style": N_STYLE, "style_value_dim": STYLE_DIM}}},
        }, f)
    with open(os.path.join(out_dir, "unicode_indexer.json"), "w") as f:
        json.dump([i % (V - 1) for i in range(0x800)], f)

    rng = np.random.default_rng(seed + 100)
    style_dir = os.path.join(out_dir, "voice_styles")
    os.makedirs(style_dir, exist_ok=True)
    for preset in ("M1", "F1"):
        ttl = rng.standard_normal((1, N_STYLE, STYLE_DIM)).astype(np.float32)
        dp = rng.standard_normal((1, N_STYLE, STYLE_DIM)).astype(np.float32)
        with open(os.path.join(style_dir, f"{preset}.json"), "w") as f:
            json.dump({
                "style_ttl": {"data": ttl.ravel().tolist(),
                              "dims": list(ttl.shape), "type": "float32"},
                "style_dp": {"data": dp.ravel().tolist(),
                             "dims": list(dp.shape), "type": "float32"},
            }, f)
    return mods


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    export_bundle(args.out_dir, seed=args.seed)
    print(json.dumps({"out_dir": args.out_dir, "seed": args.seed,
                      "graphs": sorted(CONTRACT)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
