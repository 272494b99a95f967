"""Long-form streaming example: chunks are yielded as they finish, so
playback can begin after the first chunk (time-to-first-audio), while the
rest synthesize."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo root

if os.getenv("TTS_PLATFORM") == "cpu":  # same env the CLI/server honor
    from supertonic_tpu.utils.jaxenv import force_cpu

    force_cpu()

from supertonic_tpu.utils.jaxenv import setup_compilation_cache

setup_compilation_cache()  # TPU compiles via the remote tunnel: cache them


import numpy as np

from supertonic_tpu import TTS
from supertonic_tpu.utils import write_wav

LONG_TEXT = """
The morning sun rose slowly over the quiet town. Shops opened one by one,
and the smell of fresh bread drifted along the street.

By noon, the square was full of people. Children chased each other around
the old fountain while their parents talked in the shade. A musician played
a slow tune on a worn guitar, and nobody seemed in any hurry at all.
"""

tts = TTS()
style = tts.get_voice_style("F2")

pieces = []
for i, (wav_chunk, dur) in enumerate(
    tts.engine.stream(LONG_TEXT, "en", style, total_step=5)
):
    print(f"chunk {i}: {dur:.2f}s audio ready")
    pieces.append(wav_chunk)

os.makedirs("results", exist_ok=True)
write_wav("results/example_stream.wav", np.concatenate(pieces),
          tts.sample_rate)
print("saved results/example_stream.wav")
