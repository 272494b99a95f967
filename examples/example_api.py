"""High-level API example (mirrors the reference's PyPI usage,
reference py/example_pypi.py:1-16)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

if os.getenv("TTS_PLATFORM") == "cpu":  # same env the CLI/server honor
    from supertonic_tpu.utils.jaxenv import force_cpu

    force_cpu()

from supertonic_tpu.utils.jaxenv import setup_compilation_cache

setup_compilation_cache()  # TPU compiles via the remote tunnel: cache them

from supertonic_tpu import TTS

# Without an assets dir this runs deterministic random-init weights —
# identical compute graph, placeholder audio. Point at a converted asset
# bundle (tools/convert_onnx.py) for real speech.
tts = TTS()

style = tts.get_voice_style("M4")

text = (
    "This morning, I took a walk in the park, and the sound of the birds "
    "and the breeze was so pleasant that I stopped for a long time just to "
    "listen."
)
wav, duration = tts.synthesize(text, voice_style=style)
# wav: np.ndarray [1, num_samples]; duration: np.ndarray [1]


os.makedirs("results", exist_ok=True)
tts.save_audio(wav[:, : int(tts.sample_rate * duration[0])],
               "results/example_api.wav")
print(f"saved results/example_api.wav ({duration[0]:.2f}s)")
