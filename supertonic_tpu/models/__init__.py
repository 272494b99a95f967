"""The four networks of the Supertonic pipeline (SURVEY.md §2.2), as
functional JAX modules with explicit param pytrees."""

import numpy as np

from . import duration_predictor, text_encoder, vector_estimator, vocoder
from .layers import count_params


def init_all(seed: int, cfg):
    """Initialize all four networks from an int seed (numpy RNG — see
    layers.py init note). Returns a dict with keys matching the reference's
    ONNX graph names (duration_predictor / text_encoder / vector_estimator /
    vocoder, reference py/helper.py:297-300)."""
    rng = np.random.default_rng(seed)
    return {
        "duration_predictor": duration_predictor.init(rng, cfg),
        "text_encoder": text_encoder.init(rng, cfg),
        "vector_estimator": vector_estimator.init(rng, cfg),
        "vocoder": vocoder.init(rng, cfg),
    }


def fuse_projections(params):
    """Derive fused QKV (self-attn) and KV (cross-attn) projection weights —
    fewer, larger matmuls per transformer block. Apply AFTER checkpoint
    load; do NOT use with tensor-parallel sharding (splitting the fused
    output crosses shard boundaries and forces GSPMD reshards)."""
    import copy

    def fuse_block(bp):
        bp = dict(bp)
        sa = bp["self"]
        bp["self"] = {
            "qkv": {
                "w": np.concatenate(
                    [np.asarray(sa[k]["w"]) for k in ("q", "k", "v")], axis=1
                ),
                "b": np.concatenate(
                    [np.asarray(sa[k]["b"]) for k in ("q", "k", "v")]
                ),
            },
            "o": sa["o"],
        }
        if "cross" in bp:
            ca = bp["cross"]
            bp["cross"] = {
                "q": ca["q"],
                "kv": {
                    "w": np.concatenate(
                        [np.asarray(ca[k]["w"]) for k in ("k", "v")], axis=1
                    ),
                    "b": np.concatenate(
                        [np.asarray(ca[k]["b"]) for k in ("k", "v")]
                    ),
                },
                "o": ca["o"],
            }
        return bp

    out = {}
    for model, tree in params.items():
        tree = dict(tree)
        if "blocks" in tree:
            tree["blocks"] = [fuse_block(bp) for bp in tree["blocks"]]
        out[model] = tree
    return out


def quantize_params(params, models=("vector_estimator",)):
    """Derive W8A8 int8 weights for the transformer-block linears of the
    chosen networks (default: the vector estimator — the only network in the
    ``total_step``x hot loop). Attention einsums, norms, AdaLN modulation and
    the tiny time-MLP stay bf16/f32; the quantized matmuls cover ~87% of the
    estimator step's FLOPs. Apply AFTER checkpoint load, like
    fuse_projections. Opt-in via SynthesisEngine(precision="int8")."""
    from .layers import quantize_linear

    proj_keys = ("q", "k", "v", "o", "qkv", "kv")

    def q_block(bp):
        bp = dict(bp)
        for sub in ("self", "cross"):
            if sub in bp:
                bp[sub] = {
                    k: (quantize_linear(v) if k in proj_keys else v)
                    for k, v in bp[sub].items()
                }
        if "ffn" in bp:
            bp["ffn"] = {k: quantize_linear(v) for k, v in bp["ffn"].items()}
        return bp

    out = {}
    for name, tree in params.items():
        if name in models and isinstance(tree, dict) and "blocks" in tree:
            tree = dict(tree)
            tree["blocks"] = [q_block(bp) for bp in tree["blocks"]]
        out[name] = tree
    return out


__all__ = [
    "count_params",
    "duration_predictor",
    "fuse_projections",
    "init_all",
    "quantize_params",
    "text_encoder",
    "vector_estimator",
    "vocoder",
]
