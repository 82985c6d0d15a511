"""Golden tests for the numpy TF-IDF + top-N kernels against the reference's
hard-coded sklearn/sparse_dot_topn values
(test_string_grouper.py:364-385,519-556)."""

import numpy as np

from string_grouper_ray.config import EngineConfig
from string_grouper_ray.corpus import fit_vocabulary_local
from string_grouper_ray.sparse import (
    CSRBatch,
    Postings,
    encode_tfidf,
    merge_row_topn,
    pairwise_dot,
    topn_multiply,
)
from string_grouper_ray.text import NGramTokenizer

CFG = EngineConfig()
TOK = NGramTokenizer(CFG)


def dense(csr, vocab_size):
    out = np.zeros((csr.n_rows, vocab_size))
    for i in range(csr.n_rows):
        out[i, csr.indices[csr.indptr[i] : csr.indptr[i + 1]]] = csr.data[
            csr.indptr[i] : csr.indptr[i + 1]
        ]
    return out


def test_build_matrix_self():
    # test_string_grouper.py:519-528
    vocab = fit_vocabulary_local([["foo", "bar", "baz"]], CFG)
    csr = encode_tfidf(TOK.ngrams_batch(["foo", "bar", "baz"]), vocab)
    np.testing.assert_array_equal(
        dense(csr, vocab.size), [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    )


def test_build_matrix_master_and_duplicates():
    # test_string_grouper.py:530-544 — corpus fit over both sides
    vocab = fit_vocabulary_local([["foo", "bar", "baz"], ["foo", "bar", "bop"]], CFG)
    m = encode_tfidf(TOK.ngrams_batch(["foo", "bar", "baz"]), vocab)
    d = encode_tfidf(TOK.ngrams_batch(["foo", "bar", "bop"]), vocab)
    np.testing.assert_array_equal(
        dense(m, vocab.size),
        [[0.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]],
    )
    np.testing.assert_array_equal(
        dense(d, vocab.size),
        [[0.0, 0.0, 0.0, 1.0], [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]],
    )


def test_build_matches_golden():
    # test_string_grouper.py:546-556
    vocab = fit_vocabulary_local([["foo", "bar", "baz"], ["foo", "bar", "bop"]], CFG)
    m = encode_tfidf(TOK.ngrams_batch(["foo", "bar", "baz"]), vocab)
    d = encode_tfidf(TOK.ngrams_batch(["foo", "bar", "bop"]), vocab)
    l, r, s = topn_multiply(m, Postings.from_csr(d), threshold=0.8, topn=20)
    assert set(zip(l.tolist(), r.tolist(), s.tolist())) == {(0, 0, 1.0), (1, 1, 1.0)}


def test_pairwise_similarities_golden_15_decimals():
    # test_string_grouper.py:364-385
    customers = [
        "Mega Enterprises Corporation",
        "Hyper Startup Incorporated",
        "Hyper Startup Inc.",
        "Hyper-Startup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corp.",
    ]
    centroids = [
        "Mega Enterprises Corporation",
        "Hyper Startup Inc.",
        "Hyper Startup Inc.",
        "Hyper Startup Inc.",
        "Hyper Hyper Inc.",
        "Mega Enterprises Corporation",
    ]
    vocab = fit_vocabulary_local([customers, centroids], CFG)
    a = encode_tfidf(TOK.ngrams_batch(customers), vocab)
    b = encode_tfidf(TOK.ngrams_batch(centroids), vocab)
    expected = np.array(
        [1.0, 0.6336195351561589, 1.0000000000000004, 1.0000000000000004, 1.0, 0.826462625999832]
    )
    np.testing.assert_allclose(pairwise_dot(a, b), expected, atol=1e-12)


def test_topn_respects_k_and_merge():
    texts = ["aab", "aab x", "aab y", "aab z"]
    vocab = fit_vocabulary_local([texts], CFG)
    csr = encode_tfidf(TOK.ngrams_batch(texts), vocab)
    post = Postings.from_csr(csr)
    l, r, s = topn_multiply(csr, post, threshold=0.0, topn=2)
    counts = np.bincount(l)
    assert counts.max() <= 2
    # split-chunk merge equals single-chunk topn
    half1 = CSRBatch(csr.indptr[:3] - csr.indptr[0], csr.indices[: csr.indptr[2]],
                     csr.data[: csr.indptr[2]], csr.n_cols)
    ids, ws = csr.to_lists()
    half2 = CSRBatch.from_lists(ids[2:], ws[2:], csr.n_cols)
    p1 = Postings.from_csr(half1, row_offset=0)
    p2 = Postings.from_csr(half2, row_offset=2)
    l1, r1, s1 = topn_multiply(csr, p1, 0.0, 2)
    l2, r2, s2 = topn_multiply(csr, p2, 0.0, 2)
    ml, mr, ms = merge_row_topn(
        np.concatenate([l1, l2]), np.concatenate([r1 + 0, r2]), np.concatenate([s1, s2]), 2
    )
    assert sorted(zip(ml.tolist(), mr.tolist(), np.round(ms, 12).tolist())) == sorted(
        zip(l.tolist(), r.tolist(), np.round(s, 12).tolist())
    )


def test_threshold_filters():
    texts = ["abcdef", "abcxyz"]
    vocab = fit_vocabulary_local([texts], CFG)
    csr = encode_tfidf(TOK.ngrams_batch(texts), vocab)
    l, r, s = topn_multiply(csr, Postings.from_csr(csr), threshold=0.99, topn=20)
    # only the exact self matches survive
    assert set(zip(l.tolist(), r.tolist())) == {(0, 0), (1, 1)}


def test_empty_string_rows():
    texts = ["", "ab", "abc"]
    vocab = fit_vocabulary_local([texts], CFG)
    csr = encode_tfidf(TOK.ngrams_batch(texts), vocab)
    assert csr.indptr[1] == 0 and csr.indptr[2] == 0  # no ngrams
    l, r, s = topn_multiply(csr, Postings.from_csr(csr), threshold=0.0, topn=20)
    assert set(l.tolist()) == {2}


def test_vectorized_encoder_equals_loop_encoder():
    """The ASCII fast path (packed-key / dense-trigram lookup) must produce
    the identical CSR structure and ≤1-ulp weights vs the per-gram loop
    encoder, across empty / short / repeated-gram / punctuation rows and
    both ngram sizes (3 = dense-table route, 5 = packed-key route)."""
    import random
    import string as st

    from string_grouper_ray.stages.vectorize import TfidfEncoder

    rng = random.Random(7)
    texts = [
        "".join(rng.choices(st.ascii_uppercase + st.digits + " .,&-", k=rng.randint(5, 90)))
        for _ in range(500)
    ]
    texts += ["", "ab", "abc", "aaaaaaa", "ACME Corp., Ltd.", "  x  y  z  "]
    for n in (3, 5):
        cfg = EngineConfig(ngram_size=n)
        tok = NGramTokenizer(cfg)
        vocab = fit_vocabulary_local([texts], cfg)
        ref = encode_tfidf(tok.ngrams_batch(texts), vocab)
        fast = TfidfEncoder(vocab, cfg).encode_batch(texts)
        assert np.array_equal(ref.indptr, fast.indptr)
        assert np.array_equal(ref.indices, fast.indices)
        if len(ref.data):
            assert float(np.abs(ref.data - fast.data).max()) < 1e-15


def test_vectorized_encoder_non_ascii_fallback():
    """With normalize_to_ascii=False and non-ASCII rows, encode_batch must
    fall back to the loop path and still match it exactly."""
    from string_grouper_ray.stages.vectorize import TfidfEncoder

    cfg = EngineConfig(normalize_to_ascii=False)
    tok = NGramTokenizer(cfg)
    texts = ["café au lait", "ümlaut straße", "plain ascii row", "naïve"]
    vocab = fit_vocabulary_local([texts], cfg)
    ref = encode_tfidf(tok.ngrams_batch(texts), vocab)
    fast = TfidfEncoder(vocab, cfg).encode_batch(texts)
    assert np.array_equal(ref.indptr, fast.indptr)
    assert np.array_equal(ref.indices, fast.indices)
    assert np.array_equal(ref.data, fast.data)
