"""Native C++ analyzer must produce bit-identical buckets to Python."""

import time

import numpy as np
import pytest

from super_rag_tpu.tokenize import native
from super_rag_tpu.tokenize.analyzer import Analyzer

TEXTS = [
    "The quick brown Fox jumps over the lazy dog!",
    "JAX compiles NumPy programs to XLA for TPUs & GPUs...",
    "fox fox fox FOX dog_dog under_score mixed123 numbers 42",
    "信息检索系统使用倒排索引。BM25 scores 文档 relevance.",
    "a an and are as at be by — stopwords only here",
    "",
    "single",
    "ひらがな カタカナ mixed with English words こんにちは",
    "한국어 텍스트 검색 test with Korean",
    "Ünïcödé wörds with àccents should not crash",
] * 3


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("g++ unavailable; native analyzer not built")
    return True


@pytest.mark.parametrize("use_stopwords", [True, False])
def test_matches_python(lib_available, use_stopwords):
    analyzer = Analyzer(vocab_size=1 << 14, use_stopwords=use_stopwords)
    py_terms, py_tfs, py_lens = analyzer.batch_doc_entries(
        TEXTS, slots=16, prefer_native=False
    )
    nat = native.batch_doc_entries(TEXTS, 16, 1 << 14, use_stopwords)
    assert nat is not None
    n_terms, n_tfs, n_lens = nat
    np.testing.assert_array_equal(py_lens, n_lens)
    for i in range(len(TEXTS)):
        py = {int(t): float(f) for t, f in zip(py_terms[i], py_tfs[i])
              if t != analyzer.pad_id}
        na = {int(t): float(f) for t, f in zip(n_terms[i], n_tfs[i])
              if t != analyzer.pad_id}
        assert py == na, f"doc {i}: {TEXTS[i]!r}"
    # slot order should match too (same tf-desc, first-seen tie-break)
    np.testing.assert_array_equal(py_terms, n_terms)


def test_truncation_matches(lib_available):
    text = " ".join(f"word{i}" for i in range(50)) + " word0 word0"
    analyzer = Analyzer(vocab_size=1 << 14)
    py = analyzer.batch_doc_entries([text], slots=4, prefer_native=False)
    na = native.batch_doc_entries([text], 4, 1 << 14, True)
    np.testing.assert_array_equal(py[0], na[0])
    np.testing.assert_array_equal(py[1], na[1])


def test_throughput(lib_available):
    """Native should beat Python comfortably on bulk text."""
    docs = [" ".join(f"tok{i % 997}" for i in range(400)) for _ in range(200)]
    analyzer = Analyzer(vocab_size=1 << 17)

    t0 = time.perf_counter()
    analyzer.batch_doc_entries(docs, slots=64, prefer_native=False)
    py_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    native.batch_doc_entries(docs, 64, 1 << 17, True)
    nat_t = time.perf_counter() - t0

    assert nat_t < py_t, f"native {nat_t:.3f}s vs python {py_t:.3f}s"


def test_analyzer_auto_uses_native(lib_available):
    analyzer = Analyzer(vocab_size=1 << 14)
    docs = ["some text here"] * 10
    auto = analyzer.batch_doc_entries(docs, slots=8)
    manual = analyzer.batch_doc_entries(docs, slots=8, prefer_native=False)
    np.testing.assert_array_equal(auto[0], manual[0])
