"""Native BPE encoder: bit-exactness vs the Python merge replay."""

import numpy as np
import pytest

from super_rag_tpu.models.subword import BPETokenizer, _words, train_bpe
from super_rag_tpu.tokenize.native_bpe import NativeBPE, load

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "tokenization replays byte pair merges in rank order",
    "TPUs multiply matrices with systolic arrays",
    "知识图谱 constructs entities and 关系 from text",
    "under_scored words and numbers 12345 mix freely",
] * 20


@pytest.fixture(scope="module")
def tok():
    return train_bpe(CORPUS, vocab_size=400)


@pytest.fixture(scope="module")
def native(tok):
    n = NativeBPE.create(tok.tokens, tok.merges)
    if n is None:
        pytest.skip("no native compiler in this environment")
    return n


def _python_ids(tok, text):
    out = []
    for w in _words(text):
        out.extend(tok._encode_word(w))
    return out


TEXTS = [
    "the quick brown fox",
    "Tokenization Replays MERGES",  # case folding
    "edge-cases: punct!  multi  spaces\tand\nnewlines",
    "知识图谱是关系的集合",  # pure CJK: per-character words
    "mixed 知识 ascii 图谱 tails",  # CJK appended AFTER ascii words
    "",  # empty
    "____",  # underscore-only word
    "unknown zzzzqqqq sequences survive as unk or splits",
    "ünïcode außerhalb ascii wörter",  # non-ascii letters split words
]


def test_bit_exact_vs_python(tok, native):
    for text in TEXTS:
        py = _python_ids(tok, text)
        nat = native.encode(text).tolist()
        assert nat == py, (text, py, nat)


def test_bit_exact_random_ascii(tok, native):
    rng = np.random.default_rng(0)
    alphabet = list("abcdefghij _-.,!349ABC知识图")
    for _ in range(200):
        text = "".join(rng.choice(alphabet,
                                  size=rng.integers(0, 60)).tolist())
        assert native.encode(text).tolist() == _python_ids(tok, text), text


def test_tokenizer_uses_native_and_fallback_matches(tok):
    texts = ["the quick fox", "知识 graph entities"]
    ids_a, mask_a = tok.encode_batch(texts, max_len=64)
    # force the pure-Python path on a fresh tokenizer with the same vocab
    py = BPETokenizer(tok.tokens, tok.merges)
    py._native = False  # sentinel: never build
    ids_b, mask_b = py.encode_batch(texts, max_len=64)
    assert np.array_equal(ids_a, ids_b) and np.array_equal(mask_a, mask_b)


def test_pickle_drops_native_handle(tok):
    import pickle

    tok._native_encoder()
    t2 = pickle.loads(pickle.dumps(tok))
    assert t2._native is None
    assert t2.encode_batch(["round trip"], max_len=16)[0].shape[0] == 1


def test_native_faster_than_python(tok, native):
    """Sanity, not a benchmark: the native path should not be slower on
    a repeated-encode workload (cold caches on both sides)."""
    import time

    text = " ".join(CORPUS) * 2
    py = BPETokenizer(tok.tokens, tok.merges)
    py._native = False
    t0 = time.perf_counter()
    a = py._text_ids(text)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = native.encode(text).tolist()
    t_nat = time.perf_counter() - t0
    assert a == b
    assert t_nat < t_py * 1.5, (t_nat, t_py)


def test_load_is_memoized():
    assert load() is load()
