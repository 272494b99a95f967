"""Parity tests: C++ frontend vs pure-Python frontend (same corpus).

The C++ implementation must agree character-for-character with the Python
one (which itself matches reference py/helper.py semantics).
"""

import numpy as np
import pytest

from supertonic_tpu.frontend import (
    UnicodeProcessor,
    build_default_indexer,
    preprocess_text,
)
from supertonic_tpu.frontend.native import (
    NativeUnicodeProcessor,
    load_native,
    native_preprocess,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native frontend not buildable"
)

CORPUS = [
    ("Hello world", "en"),
    ("Hello world.", "en"),
    ("what ?  really !", "en"),
    ("a–b—c_d [x] |y| /z/ #tag", "en"),
    ("“curly quotes” and ‘single’ ones", "en"),
    ("me@home and fruits, e.g., apples, i.e., the red ones", "en"),
    ('she said ""hi"" and ``bye``', "en"),
    ("hearts ♥ stars ☆ love ♡ copy © back\\slash", "en"),
    ("emoji test 😀🚀🎉 flag 🇺🇸 done", "en"),
    ("ellipsis… here", "en"),
    ("trailing quote”", "en"),
    ("multi   space\t\ttabs\nnewlines", "en"),
    ("café résumé naïve", "fr"),
    ("mañana señor", "es"),
    ("ação coração", "pt"),
    ("안녕하세요 세계", "ko"),
    ("한국어 테스트 문장입니다", "ko"),
    ("ﬁne ligature ™ symbol ½ fraction", "en"),
    ("ＦＵＬＬｗｉｄｔｈ", "en"),
    ("already ends!", "en"),
    ("colon ends:", "en"),
    ("CJK stop。", "en"),
    ("", "en"),
]


def test_preprocess_parity_corpus():
    for text, lang in CORPUS:
        py = preprocess_text(text, lang)
        cc = native_preprocess(text, lang)
        assert cc == py, f"mismatch for {text!r} ({lang}): {cc!r} != {py!r}"


def test_invalid_lang_raises():
    with pytest.raises(ValueError):
        native_preprocess("hi", "de")


def test_tokenize_parity():
    idx = build_default_indexer()
    py_proc = UnicodeProcessor(idx)
    cc_proc = NativeUnicodeProcessor(idx)
    texts = [t for t, _ in CORPUS if t]
    langs = [g for t, g in CORPUS if t]
    ids_py, mask_py = py_proc(texts, langs)
    ids_cc, mask_cc = cc_proc(texts, langs)
    np.testing.assert_array_equal(ids_py, ids_cc)
    np.testing.assert_array_equal(mask_py, mask_cc)


def test_tokenize_parity_bucketed():
    idx = build_default_indexer()
    py_proc = UnicodeProcessor(idx)
    cc_proc = NativeUnicodeProcessor(idx)
    ids_py, _ = py_proc(["Short."], ["en"], max_len=64)
    ids_cc, _ = cc_proc(["Short."], ["en"], max_len=64)
    np.testing.assert_array_equal(ids_py, ids_cc)


def test_random_unicode_fuzz():
    rng = np.random.default_rng(0)
    pools = (
        list(range(0x20, 0x7F))
        + list(range(0xA0, 0x100))
        + list(range(0xAC00, 0xAC80))
        + list(range(0x2010, 0x2030))
        + [0x1F600, 0x1F680, 0x2764]
    )
    for _ in range(50):
        n = int(rng.integers(1, 80))
        text = "".join(chr(int(c)) for c in rng.choice(pools, n))
        py = preprocess_text(text, "en")
        cc = native_preprocess(text, "en")
        assert cc == py, f"fuzz mismatch for {text!r}"


def test_canonical_reordering_parity():
    """Stacked/multiple combining marks must come out in canonical order,
    exactly as Python's unicodedata.normalize('NFKD') reorders them
    (ADVICE r1: the C++ NFKD previously skipped canonical ordering)."""
    cases = [
        "ạ́b",          # dot-below(220) + acute(230): keep order
        "ạ́b",          # acute then dot-below: must swap
        "ẹ̈̄x",    # three marks incl. ccc 220 after 230s
        "q̣̇t",          # hamlet case (dot-above + dot-below)
        "ọ́ señör",                 # precomposed + stacked input
        "ệ",                 # ê decomposes, then dot-below reorders in
        "̣́leading marks",
    ]
    for text in cases:
        py = preprocess_text(text, "es")
        cc = native_preprocess(text, "es")
        assert cc == py, f"reorder mismatch for {text!r}: {cc!r} != {py!r}"


def test_random_combining_mark_fuzz():
    rng = np.random.default_rng(7)
    marks = [0x0300, 0x0301, 0x0308, 0x0304, 0x0323, 0x0327, 0x0331, 0x0345]
    base = list(range(0x61, 0x7B)) + [0xE9, 0xE7, 0x6E]
    for _ in range(100):
        out = []
        for _ in range(int(rng.integers(1, 25))):
            out.append(chr(int(rng.choice(base))))
            for _ in range(int(rng.integers(0, 4))):
                out.append(chr(int(rng.choice(marks))))
        text = "".join(out)
        py = preprocess_text(text, "fr")
        cc = native_preprocess(text, "fr")
        assert cc == py, f"mark fuzz mismatch for {text!r}"


def test_sanitized_native_build(tmp_path):
    """Run the C++ test driver under ASan/UBSan (make sanitize)."""
    import os
    import subprocess

    native_dir = os.path.join(
        os.path.dirname(__file__), "..", "supertonic_tpu", "native"
    )
    try:
        proc = subprocess.run(
            ["make", "-C", native_dir, "sanitize"],
            capture_output=True, text=True, timeout=300,
        )
    except (FileNotFoundError, subprocess.TimeoutExpired):
        pytest.skip("no native toolchain")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "NATIVE FRONTEND TESTS PASSED" in proc.stdout


# --------------------------------------------------------------- chunker ---

CHUNK_CORPUS = [
    "Dr. Smith met Mr. Jones at 5 p.m. sharp. They talked.",
    "The U.S. Government and the E.U. Commission agreed. Next item.",
    "F. Scott Fitzgerald wrote it. B. B. King played it.",
    "e.g., apples, i.e., the red ones, etc. are fruits. Right?",
    "Para one sentence one. Para one sentence two.\n\nPara two starts here.",
    "One! Two? Three. Four;\n\n\n  Five after blank lines.",
    "A sentence with, many, commas, that keeps, going, and going, and "
    "going, far beyond any reasonable budget, to force comma fallback.",
    "Supercalifragilisticexpialidocious" * 12 + " tail words here.",
    "안녕하세요. 오늘 날씨가 참 좋네요. 산책을 갈까요? 네, 좋아요. " * 6,
    "Mixed café sentences. Ação coração! Mañana señor? Fin.",
    "  leading and trailing whitespace  \n\n  around paragraphs  ",
    "no terminal punctuation at all just words",
    "",
    "...",
    "Inc. Ltd. Co. Corp. St. Ave. Blvd. all abbreviations. Done.",
    "a. b. c. single letters split. lowercase ok.",
    "line one\nline two stays in one chunk. second sentence here.",
]


def test_chunker_parity_corpus():
    from supertonic_tpu.frontend.chunker import _chunk_text_py
    from supertonic_tpu.frontend.native import native_chunk_text

    for text in CHUNK_CORPUS:
        for max_len in (20, 40, 120, 300):
            py = _chunk_text_py(text, max_len)
            cc = native_chunk_text(text, max_len)
            assert cc == py, (
                f"chunk mismatch for {text!r} max_len={max_len}: "
                f"{cc!r} != {py!r}"
            )


def test_chunker_parity_fuzz():
    from supertonic_tpu.frontend.chunker import _chunk_text_py
    from supertonic_tpu.frontend.native import native_chunk_text

    rng = np.random.default_rng(21)
    words = ["alpha", "beta", "Dr.", "Mr.", "U.S.", "F.", "gamma,", "delta",
             "안녕", "café", "№", "x" * 35, "e.g.,", "—", "5",
             "ﬁn", "end."]
    seps = [" ", " ", " ", "  ", "\n", "\n\n", ". ", "! ", "? ", ", ",
            ".\n\n", "\t"]
    for _ in range(150):
        n = int(rng.integers(1, 60))
        parts = []
        for _ in range(n):
            parts.append(str(rng.choice(words)))
            parts.append(str(rng.choice(seps)))
        text = "".join(parts)
        max_len = int(rng.choice([15, 30, 60, 120, 300]))
        py = _chunk_text_py(text, max_len)
        cc = native_chunk_text(text, max_len)
        assert cc == py, (
            f"chunk fuzz mismatch max_len={max_len} for {text!r}:\n"
            f"native={cc!r}\npython={py!r}"
        )


def test_chunker_comma_dense_grows_output(monkeypatch):
    """The comma fallback INSERTS a space per comma with no following
    whitespace, so output exceeds input length — must not overflow the
    native output buffer (regression: out_cap was len+64)."""
    from supertonic_tpu.frontend.chunker import _chunk_text_py
    from supertonic_tpu.frontend.native import native_chunk_text

    text = ",".join(str(i) for i in range(400)) + "."
    for max_len in (30, 120, 300):
        assert native_chunk_text(text, max_len) == _chunk_text_py(text, max_len)


def test_chunk_text_env_dispatch(monkeypatch):
    """TTS_NATIVE_FRONTEND=1 routes frontend.chunk_text through the C++
    twin (same opt-in as the native normalizer) with identical output."""
    from supertonic_tpu.frontend import chunk_text
    from supertonic_tpu.frontend.chunker import _chunk_text_py

    text = "Dr. Smith spoke at length. " * 30
    monkeypatch.setenv("TTS_NATIVE_FRONTEND", "1")
    native = chunk_text(text, max_len=80)
    monkeypatch.delenv("TTS_NATIVE_FRONTEND")
    assert native == _chunk_text_py(text, max_len=80)
    assert len(native) > 3


def test_batch_frontend_thread_safety():
    """The whole-batch native call is used by concurrent feeder threads;
    results under contention must be identical to single-threaded ones
    (no shared mutable state in the C++ path)."""
    import concurrent.futures

    proc = NativeUnicodeProcessor(build_default_indexer())
    texts = ["Thread safety check sentence number %d." % i for i in range(16)]
    langs = ["en"] * 16
    want_ids, want_mask = proc(texts, langs)

    def run(_):
        ids, mask = proc(texts, langs)
        return np.array_equal(ids, want_ids) and np.array_equal(mask, want_mask)

    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        results = list(pool.map(run, range(64)))
    assert all(results)


def test_batch_frontend_nul_fallback():
    """Embedded NUL can't ride the NUL-separated blob; the processor must
    fall back to the per-call path and still match Python."""
    proc = NativeUnicodeProcessor(build_default_indexer())
    py = UnicodeProcessor(build_default_indexer())
    texts = ["has a \x00 nul", "normal text"]
    ids_n, mask_n = proc(texts, ["en", "en"])
    ids_p, mask_p = py(texts, ["en", "en"])
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_batch_frontend_fuzz_parity():
    """Random unicode through the whole-batch native path vs the Python
    processor — ids AND masks bit-equal (the per-call fuzz above doesn't
    exercise stpu_frontend_batch)."""
    rng = np.random.default_rng(3)
    idx = build_default_indexer()
    py_proc = UnicodeProcessor(idx)
    cc_proc = NativeUnicodeProcessor(idx)
    pools = (
        list(range(0x20, 0x7F))
        + list(range(0xA0, 0x100))
        + list(range(0xAC00, 0xAC80))
        + list(range(0x2010, 0x2030))
        + [0x1F600, 0x2764, 0x2026]
    )
    langs5 = ["en", "ko", "es", "pt", "fr"]
    for _ in range(30):
        n = int(rng.integers(1, 9))
        texts = ["".join(chr(int(c))
                         for c in rng.choice(pools, int(rng.integers(1, 60))))
                 for _ in range(n)]
        langs = [str(rng.choice(langs5)) for _ in range(n)]
        ids_p, mask_p = py_proc(texts, langs)
        ids_c, mask_c = cc_proc(texts, langs)
        np.testing.assert_array_equal(ids_p, ids_c, err_msg=repr(texts))
        np.testing.assert_array_equal(mask_p, mask_c)


def test_batch_frontend_matches_python_contract_edges():
    """Zip truncation on mismatched lengths and NUL-in-lang must behave
    exactly like the Python processor (raise or truncate, never silently
    misalign the NUL-separated blobs)."""
    idx = build_default_indexer()
    py_proc = UnicodeProcessor(idx)
    cc_proc = NativeUnicodeProcessor(idx)
    # extra texts truncated by zip
    ids_p, mask_p = py_proc(["a.", "b.", "c."], ["en", "en"])
    ids_c, mask_c = cc_proc(["a.", "b.", "c."], ["en", "en"])
    np.testing.assert_array_equal(ids_p, ids_c)
    np.testing.assert_array_equal(mask_p, mask_c)
    # NUL inside a lang: must raise like Python, not misalign rows
    with pytest.raises(ValueError):
        py_proc(["a.", "b."], ["en\x00ko", "fr"])
    with pytest.raises(ValueError):
        cc_proc(["a.", "b."], ["en\x00ko", "fr"])


def test_nfkd_full_coverage_scripts():
    """The NFKD table must cover ALL decomposing codepoints — Cyrillic,
    polytonic Greek, and Kana previously diverged from Python (the table
    was generated over selected ranges only)."""
    from supertonic_tpu.frontend.native import load_native, native_preprocess
    from supertonic_tpu.frontend.normalize import preprocess_text

    if load_native() is None:
        pytest.skip("native frontend unavailable")
    for word in ("й", "ёлка", "ἀγορά", "ガ", "Ǆ", "ﬃ", "Ⅷ", "ｶﾞ"):
        assert native_preprocess(word, "en") == preprocess_text(word, "en"), \
            word


def test_native_chunker_nul_falls_back(monkeypatch):
    """A NUL byte would truncate the C chunker's input — such texts take
    the Python path instead of silently dropping following sentences."""
    from supertonic_tpu.frontend.chunker import _chunk_text_py, chunk_text

    monkeypatch.setenv("TTS_NATIVE_FRONTEND", "1")
    text = ("First sentence here. \x00 Second sentence continues after "
            "the nul byte.")
    assert chunk_text(text, 30) == _chunk_text_py(text, 30)


def test_native_tokenize_out_of_table_clamps():
    """Out-of-table codepoints map to indexer[0] like Python's np.where
    clamp, not literal 0."""
    import numpy as np

    from supertonic_tpu.frontend.native import NativeUnicodeProcessor, \
        load_native
    from supertonic_tpu.frontend.normalize import UnicodeProcessor

    if load_native() is None:
        pytest.skip("native frontend unavailable")
    indexer = np.arange(7, 7 + 128, dtype=np.int64)  # indexer[0] == 7
    nat = NativeUnicodeProcessor(indexer)
    py = UnicodeProcessor(indexer)
    text = "a中"  # 'a' in table, CJK char far outside
    np.testing.assert_array_equal(nat.tokenize_text(text),
                                  py.tokenize(text))
