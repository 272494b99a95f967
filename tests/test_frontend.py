"""Golden tests for the text frontend (reference semantics, SURVEY.md §2.4)."""

import numpy as np
import pytest

from supertonic_tpu.frontend import (
    UnicodeProcessor,
    build_default_indexer,
    get_latent_mask,
    length_to_mask,
    preprocess_text,
)


class TestPreprocess:
    def test_wraps_lang_tags(self):
        assert preprocess_text("Hello world.", "en") == "<en>Hello world.</en>"

    def test_appends_period(self):
        assert preprocess_text("Hello world", "en") == "<en>Hello world.</en>"

    def test_keeps_terminal_punct(self):
        for p in [".", "!", "?", ";", ":", ",", "。", "»"]:
            out = preprocess_text(f"Hi{p}", "en")
            assert out == f"<en>Hi{p}</en>", p

    def test_ellipsis_nfkd_decomposes_then_kept(self):
        # NFKD runs before the terminal check (py/helper.py:23), so U+2026
        # becomes "..." and no extra period is appended.
        assert preprocess_text("Hi…", "en") == "<en>Hi...</en>"

    def test_symbol_replacements(self):
        assert preprocess_text("a–b—c_d", "en") == "<en>a-b-c d.</en>"
        # trailing " is terminal punctuation -> no appended period
        assert preprocess_text("“quoted”", "en") == '<en>"quoted"</en>'
        assert preprocess_text("it’s", "en") == "<en>it's.</en>"
        assert preprocess_text("a[b]c|d/e#f", "en") == "<en>a b c d e f.</en>"

    def test_special_symbols_removed(self):
        assert preprocess_text("a♥b☆c♡d©e\\f", "en") == "<en>abcdef.</en>"

    def test_expression_expansion(self):
        assert preprocess_text("me@home", "en") == "<en>me at home.</en>"
        assert (
            preprocess_text("fruits, e.g., apples", "en")
            == "<en>fruits, for example, apples.</en>"
        )
        assert (
            preprocess_text("that, i.e., this", "en") == "<en>that, that is, this.</en>"
        )

    def test_punctuation_spacing_fix(self):
        assert preprocess_text("Hello , world .", "en") == "<en>Hello, world.</en>"
        assert preprocess_text("what ?", "en") == "<en>what?</en>"

    def test_duplicate_quote_collapse(self):
        assert preprocess_text('she said ""hi""', "en") == '<en>she said "hi"</en>'

    def test_whitespace_collapse(self):
        assert preprocess_text("a   b\t\nc", "en") == "<en>a b c.</en>"

    def test_emoji_stripped(self):
        assert preprocess_text("hello 😀🚀 world", "en") == "<en>hello world.</en>"
        assert preprocess_text("flag 🇺🇸 here", "en") == "<en>flag here.</en>"

    def test_nfkd_decomposes_accents(self):
        # é (U+00E9) NFKD-decomposes to e + combining acute (U+0301)
        out = preprocess_text("café", "fr")
        assert "é" in out

    def test_nfkd_decomposes_hangul(self):
        out = preprocess_text("안녕", "ko")
        # Hangul syllables decompose into Jamo (U+1100 block)
        assert any(0x1100 <= ord(c) <= 0x11FF for c in out)

    def test_invalid_lang_raises(self):
        with pytest.raises(ValueError):
            preprocess_text("hi", "de")

    def test_backtick_to_quote_before_collapse(self):
        # ` is mapped to ' first, so `` becomes '' which collapses to '
        assert preprocess_text("a``b", "en") == "<en>a'b.</en>"


class TestMasks:
    def test_length_to_mask(self):
        m = length_to_mask(np.array([2, 4]))
        assert m.shape == (2, 1, 4)
        np.testing.assert_array_equal(m[0, 0], [1, 1, 0, 0])
        np.testing.assert_array_equal(m[1, 0], [1, 1, 1, 1])

    def test_length_to_mask_padded(self):
        m = length_to_mask(np.array([2]), max_len=6)
        assert m.shape == (1, 1, 6)
        assert m.sum() == 2

    def test_latent_mask_ceil(self):
        # wav_len 1000, chunk 128 -> ceil = 8 frames
        m = get_latent_mask(np.array([1000, 128, 129]), 64, 2)
        assert m.shape[2] == 8
        assert m[0].sum() == 8
        assert m[1].sum() == 1
        assert m[2].sum() == 2


class TestProcessor:
    def test_batch_padding_and_mask(self):
        proc = UnicodeProcessor(build_default_indexer())
        ids, mask = proc(["Hi", "A longer sentence here"], ["en", "en"])
        assert ids.shape[0] == 2
        assert ids.dtype == np.int64
        assert mask.shape == (2, 1, ids.shape[1])
        # row 0 is shorter: padded region must be 0
        l0 = int(mask[0].sum())
        assert (ids[0, l0:] == 0).all()
        assert (ids[0, :l0] > 0).all()

    def test_bucketed_padding(self):
        proc = UnicodeProcessor(build_default_indexer())
        ids, mask = proc(["Hi"], ["en"], max_len=64)
        assert ids.shape == (1, 64)
        assert mask.shape == (1, 1, 64)

    def test_deterministic(self):
        proc = UnicodeProcessor(build_default_indexer())
        a, _ = proc(["Same text"], ["en"])
        b, _ = proc(["Same text"], ["en"])
        np.testing.assert_array_equal(a, b)

    def test_korean_tokenizes_nonzero(self):
        proc = UnicodeProcessor(build_default_indexer())
        ids, mask = proc(["안녕하세요"], ["ko"])
        l = int(mask.sum())
        assert (ids[0, :l] > 0).all()

    def test_max_len_too_small_raises(self):
        proc = UnicodeProcessor(build_default_indexer())
        with pytest.raises(ValueError):
            proc(["A fairly long sentence that exceeds"], ["en"], max_len=8)
