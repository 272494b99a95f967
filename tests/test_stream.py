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


def test_vocode_window_equals_full(engine, style, tiny_config):
    """The halo guarantee: windowed vocoding with halo >= receptive field
    reproduces full-sequence vocoding BIT-EXACTLY on the same latent."""
    import jax.numpy as jnp

    from supertonic_tpu.engine import synthesis as S
    from supertonic_tpu.models import vocoder
    from supertonic_tpu.models.vocoder import receptive_field_frames

    cfg = tiny_config
    rng = np.random.default_rng(3)
    T = 21
    xt = jnp.asarray(rng.standard_normal((1, T, cfg.latent_channels)),
                     jnp.float32)
    mask = jnp.ones((T,), jnp.float32)
    full = np.asarray(vocoder.apply(engine.params["vocoder"], cfg, xt,
                                    frame_mask=mask))
    halo = receptive_field_frames(cfg)
    win_fn = S.jit_vocode_window(cfg, precision="f32")
    xt_pad = jnp.pad(xt, ((0, 0), (halo, halo), (0, 0)))
    mask_pad = jnp.pad(mask, (halo, halo))
    w = 4
    pieces = []
    for k0 in range(0, T, w):
        start = max(0, min(k0, T - w))
        wav = np.asarray(win_fn(engine.params, xt_pad, mask_pad,
                                jnp.int32(start), w, halo, "f32"))
        off = (k0 - start) * cfg.chunk_size
        n = min((T - k0), w) * cfg.chunk_size
        pieces.append(wav[:, off: off + n])
    got = np.concatenate(pieces, axis=1)
    np.testing.assert_array_equal(got, full)


def test_stream_windows_pieces_and_flags(engine, style):
    """stream_windows yields continuation pieces then exactly one chunk_end
    per text chunk; concatenated samples cover exactly the trimmed
    durations."""
    text = "One single chunk of text, streamed in vocoder windows."
    pieces = list(engine.stream_windows(text, "en", style, total_step=2,
                                        window_frames=4))
    assert len(pieces) > 1, "windowing must split the chunk"
    assert all(not end for *_x, end in pieces[:-1])
    assert pieces[-1][2] is True
    total = sum(len(p[0]) for p in pieces)
    dur = sum(p[1] for p in pieces)
    assert total == int(round(dur * engine.cfg.sample_rate))


def test_stream_windows_multichunk_flags(engine, style):
    got = list(engine.stream_windows(LONG, "en", style, total_step=2,
                                     window_frames=8))
    from supertonic_tpu.frontend import chunk_text

    n_chunks = len(chunk_text(LONG, max_len=300))
    assert sum(1 for *_x, end in got if end) == n_chunks
    assert sum(1 for *_x, end in got if not end) >= 1


def test_receptive_field_value(tiny_config):
    from supertonic_tpu.models.vocoder import receptive_field_frames

    from supertonic_tpu.config import TTSConfig

    assert receptive_field_frames(tiny_config) >= 4
    # default stack: pre 3 + res 16 + up 2 + res 16/8 + up 2/8 + res 16/64
    # + head 1/64 -> ceil(23.53) = 24
    assert receptive_field_frames(TTSConfig()) == 24
