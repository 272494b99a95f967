"""Chunker behavior + property tests (reference py/helper.py:388-429 semantics
plus the Rust fallback levels, rust/src/helper.rs:330-450)."""

import numpy as np

from supertonic_tpu.frontend import chunk_text, max_len_for_lang, split_sentences


def test_short_text_single_chunk():
    assert chunk_text("Hello world.") == ["Hello world."]


def test_paragraph_split():
    chunks = chunk_text("First para.\n\nSecond para.")
    assert chunks == ["First para.", "Second para."]


def test_sentences_packed_greedily():
    text = "One. Two. Three."
    assert chunk_text(text, max_len=300) == ["One. Two. Three."]
    assert chunk_text(text, max_len=10) == ["One. Two.", "Three."]


def test_abbreviations_not_split():
    sents = split_sentences("Dr. Smith met Mr. Jones. They talked.")
    assert sents == ["Dr. Smith met Mr. Jones.", "They talked."]


def test_initials_not_split():
    sents = split_sentences("J. K. Rowling wrote it. Yes.")
    assert sents == ["J. K. Rowling wrote it.", "Yes."]


def test_eg_ie_not_split():
    sents = split_sentences("Fruits, e.g. apples, are good. Agreed.")
    assert sents == ["Fruits, e.g. apples, are good.", "Agreed."]


def test_question_exclamation():
    sents = split_sentences("Really? Yes! Fine.")
    assert sents == ["Really?", "Yes!", "Fine."]


def test_oversized_sentence_comma_fallback():
    text = ", ".join(["clause %d" % i for i in range(40)]) + "."
    chunks = chunk_text(text, max_len=60)
    assert len(chunks) > 1
    assert all(len(c) <= 60 for c in chunks)


def test_oversized_sentence_word_fallback():
    text = " ".join(["word%03d" % i for i in range(100)]) + "."
    chunks = chunk_text(text, max_len=50)
    assert all(len(c) <= 50 for c in chunks)
    # no content dropped
    joined = " ".join(chunks)
    for i in range(100):
        assert ("word%03d" % i) in joined


def test_property_random_texts_respect_max_len(rng):
    words = ["alpha", "beta", "gamma", "delta", "epsilon,", "zeta.", "eta!", "theta?"]
    for trial in range(20):
        n = int(rng.integers(1, 200))
        text = " ".join(rng.choice(words, size=n))
        for max_len in (50, 120, 300):
            chunks = chunk_text(text, max_len=max_len)
            assert all(len(c) <= max_len for c in chunks), (trial, max_len)


def test_max_len_for_lang():
    assert max_len_for_lang("ko") == 120
    for lang in ("en", "es", "pt", "fr"):
        assert max_len_for_lang(lang) == 300


def test_empty_text():
    assert chunk_text("") == []
    assert chunk_text("   \n\n  ") == []
