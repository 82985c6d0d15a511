"""Property-based differential tests (hypothesis) for the numeric kernels
everything else depends on: the tokenizer's vectorized packed-bytes gram
extraction, the vectorized TF-IDF encoder, and the pair-dot verify kernel.
Each is compared against an independently written naive implementation of
the same spec (the reference analyzer semantics, dense numpy cosine) over
randomized inputs — the reference's own suite has no property tests
(SURVEY.md §5), and the golden cases cannot cover unicode/empty/collision
edge cases the way randomized differentials do.

These are pure-driver tests (no Ray datasets), so they run in milliseconds
per example.
"""

import re
from unicodedata import normalize as _unicode_normalize

import numpy as np
import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from string_grouper_ray.config import EngineConfig
from string_grouper_ray.corpus import fit_vocabulary_local
from string_grouper_ray.sparse import encode_tfidf, encode_tfidf_ascii, pair_dots
from string_grouper_ray.text import NGramTokenizer

# text with unicode accents, punctuation the default regex strips, spaces,
# and plain words — the shapes the analyzer must handle
_texts = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ 0189,-./\tÀéîôüç€ßñ中")
    ),
    min_size=0,
    max_size=24,
)


def _naive_reference_ngrams(s: str, cfg: EngineConfig) -> list:
    """The reference analyzer spec, written independently of text.py
    (reference string_grouper.py:365-378): lower → NFKD→ASCII → regex
    delete → char windows."""
    if cfg.ignore_case:
        s = s.lower()
    if cfg.normalize_to_ascii:
        s = _unicode_normalize("NFKD", s).encode("ASCII", "ignore").decode()
    s = re.sub(cfg.regex, "", s)
    n = cfg.ngram_size
    return [s[i : i + n] for i in range(max(0, len(s) - n + 1))]


@settings(max_examples=300, deadline=None)
@given(st.lists(_texts, min_size=0, max_size=8), st.integers(2, 4), st.booleans())
def test_tokenizer_matches_naive_spec(texts, ngram_size, ignore_case):
    cfg = EngineConfig(ngram_size=ngram_size, ignore_case=ignore_case)
    tok = NGramTokenizer(cfg)
    got = tok.ngrams_batch(texts)
    want = [_naive_reference_ngrams(s, cfg) for s in texts]
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=10))
def test_vectorized_encoder_matches_loop_encoder(texts):
    """encode_tfidf_ascii (packed-bytes, no Python gram objects) must be
    bit-compatible with the loop encoder on the same normalized input."""
    cfg = EngineConfig()
    tok = NGramTokenizer(cfg)
    vocab = fit_vocabulary_local([texts], cfg)
    loop = encode_tfidf(tok.ngrams_batch(texts), vocab)
    fast = encode_tfidf_ascii(tok.normalized_batch(texts), vocab, cfg.ngram_size)
    assert np.array_equal(loop.indptr, fast.indptr)
    assert np.array_equal(loop.indices, fast.indices)
    assert np.allclose(loop.data, fast.data, rtol=0, atol=1e-15)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(_texts, min_size=2, max_size=8),
    st.randoms(use_true_random=False),
)
def test_pair_dots_matches_dense_cosine(texts, rnd):
    """The LSH verify kernel vs dense numpy cosine on random row pairs."""
    cfg = EngineConfig()
    tok = NGramTokenizer(cfg)
    vocab = fit_vocabulary_local([texts], cfg)
    csr = encode_tfidf(tok.ngrams_batch(texts), vocab)
    n = csr.n_rows
    if vocab.size == 0:
        return
    dense = np.zeros((n, vocab.size), dtype=np.float64)
    for i in range(n):
        sl = slice(csr.indptr[i], csr.indptr[i + 1])
        dense[i, csr.indices[sl]] = csr.data[sl]
    pairs = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(6)]
    l = np.array([p[0] for p in pairs], dtype=np.int64)
    r = np.array([p[1] for p in pairs], dtype=np.int64)
    got = pair_dots(csr, csr, l, r)
    want = np.array([float(dense[i] @ dense[j]) for i, j in pairs])
    assert np.allclose(got, want, rtol=0, atol=1e-12)
