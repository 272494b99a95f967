"""Streaming long-form synthesis tests."""

import numpy as np
import pytest

from supertonic_tpu.engine import SynthesisEngine, VoiceStyle
from supertonic_tpu.frontend import UnicodeProcessor, build_default_indexer, chunk_text
from supertonic_tpu.models import init_all

LONG = " ".join(
    f"Sentence number {i} continues the long running document with a few "
    "extra words for padding." for i in range(10)
)  # ~900 chars -> several 300-char chunks


@pytest.fixture(scope="module")
def engine(tiny_config):
    params = init_all(0, tiny_config)
    proc = UnicodeProcessor(build_default_indexer())
    return SynthesisEngine(params, tiny_config, proc, precision="f32", seed=0)


@pytest.fixture(scope="module")
def style(tiny_config):
    rng = np.random.default_rng(7)
    cfg = tiny_config
    return VoiceStyle(
        rng.standard_normal(
            (1, cfg.ttl.style.n_style, cfg.ttl.style.style_value_dim)
        ).astype(np.float32),
        rng.standard_normal(
            (1, cfg.dp.style.n_style, cfg.dp.style.style_value_dim)
        ).astype(np.float32),
    )


def test_stream_yields_all_chunks(engine, style):
    n_chunks = len(chunk_text(LONG, max_len=120))
    assert n_chunks >= 2
    got = list(engine.stream(LONG, "en", style, total_step=2))
    # one yield per text chunk (ko/other max_len differ; en=300 merges some)
    n_expected = len(chunk_text(LONG, max_len=300))
    assert len(got) == n_expected
    for wav, dur in got:
        assert dur > 0
        assert len(wav) == int(engine.cfg.sample_rate * dur)


def test_stream_first_chunk_before_rest(engine, style):
    gen = engine.stream(LONG, "en", style, total_step=2, group_size=1)
    wav, dur = next(gen)  # first audio available without draining the rest
    assert dur > 0
    rest = list(gen)
    assert len(rest) >= 1
