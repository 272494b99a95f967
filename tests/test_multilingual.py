"""BASELINE configs 2+3: multilingual batch over one model, all 10 voice
presets, mixed lengths with padding."""

import numpy as np
import pytest

from supertonic_tpu.assets import synthesize_default_styles
from supertonic_tpu.config import VOICE_PRESETS
from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer
from supertonic_tpu.models import init_all


@pytest.fixture(scope="module")
def engine(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    return SynthesisEngine(params, tiny_config, proc, precision="f32", seed=0)


def test_multilingual_batch_all_langs(engine, tiny_config):
    """One batch spanning all 5 languages through a single compiled program
    (BASELINE config 3)."""
    texts = [
        "Good morning everyone.",
        "안녕하세요 여러분.",
        "Buenos días a todos.",
        "Bom dia a todos.",
        "Bonjour à tous.",
    ]
    langs = ["en", "ko", "es", "pt", "fr"]
    styles = synthesize_default_styles(tiny_config)
    style = VoiceStyle(
        np.concatenate([styles[n].ttl for n in ("M1", "M2", "M3", "F1", "F2")]),
        np.concatenate([styles[n].dp for n in ("M1", "M2", "M3", "F1", "F2")]),
    )
    wav, dur = engine.batch(texts, langs, style, total_step=2)
    assert wav.shape[0] == 5
    assert (dur > 0).all()
    # every row is non-silent inside its duration
    for b in range(5):
        n = int(tiny_config.sample_rate * dur[b])
        assert np.abs(wav[b, :n]).max() > 0


def test_all_ten_presets_batch(engine, tiny_config):
    """All 10 voice presets in one batch (BASELINE config 2 style sweep);
    different styles must produce different audio for the same text."""
    styles = synthesize_default_styles(tiny_config)
    style = VoiceStyle(
        np.concatenate([styles[n].ttl for n in VOICE_PRESETS]),
        np.concatenate([styles[n].dp for n in VOICE_PRESETS]),
    )
    texts = ["The same sentence for every voice."] * len(VOICE_PRESETS)
    wav, dur = engine.batch(texts, ["en"] * len(texts), style, total_step=2)
    assert wav.shape[0] == 10
    # style conditioning reaches the output: rows differ pairwise
    diffs = [
        np.abs(wav[i] - wav[j]).max()
        for i in range(3)
        for j in range(i + 1, 4)
    ]
    assert min(diffs) > 1e-6


def test_mixed_lengths_padding(engine, tiny_config):
    """Mixed-length batch: per-row trim boundaries respected (BASELINE
    config 2 mixed lengths)."""
    texts = ["Hi.", "A medium length sentence for the middle row.",
             "Quite a bit longer sentence that should produce the longest "
             "audio of the three rows in this batch."]
    styles = synthesize_default_styles(tiny_config)
    style = VoiceStyle(
        np.concatenate([styles["M1"].ttl] * 3),
        np.concatenate([styles["M1"].dp] * 3),
    )
    wav, dur = engine.batch(texts, ["en"] * 3, style, total_step=2)
    assert dur[0] < dur[1] < dur[2]
    # padded region beyond each duration is vocoder padding, but the wav
    # window must cover the longest row
    assert wav.shape[1] >= int(tiny_config.sample_rate * dur[2])
